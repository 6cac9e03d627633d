"""CPU-mesh relative scaling-efficiency report (SCALING.md source).

Runs the batched flagship pipeline (CKKS mult+relin+rescale) and the sharded
BFV BEHZ multiply over (data x limb) meshes of 1..8 virtual CPU devices with
batch proportional to device count, and reports throughput scaling relative
to the 1-device mesh.

Caveat (recorded in SCALING.md): the 8 "devices" are XLA host-platform
virtual devices sharing one CPU, so absolute speedup is bounded by host
cores; the quantity of interest is that the *sharded program* (GSPMD
partitioning + collectives) adds little overhead vs the unsharded one, i.e.
the per-ciphertext work stays constant as the mesh grows. On real ICI-linked
chips the same program scales with hardware.
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.context import SealContext
from seal_tpu.encoders import BatchEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.parallel import BatchEvaluator
from seal_tpu.parallel.batch import CiphertextBatch
from seal_tpu.parallel.mesh import HEMesh, make_mesh
from seal_tpu.random import PRNGType, UniformRandomGeneratorFactory

N = 4096
PER_DEV = 2  # ciphertexts per data-parallel shard
ITERS = 6


def build_ckks():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 30, 30, 30, 40]))
    parms.set_random_generator(UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, (5,) * 8))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    return ctx, kg


def build_bfv():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 30, 30, 40]))
    parms.set_plain_modulus(PlainModulus.batching(N, 20))
    parms.set_random_generator(UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, (6,) * 8))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    return ctx, kg


def time_pipeline(run, iters=ITERS):
    run()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def ckks_case(ndev):
    ctx, kg = build_ckks()
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    encoder = CKKSEncoder(ctx)
    hem = make_mesh(ndev, limb_parallel=1)
    bev = BatchEvaluator(ctx, hem)
    B = PER_DEV * ndev
    rng = np.random.default_rng(1)
    cts = [
        enc.encrypt_symmetric(encoder.encode(rng.uniform(-1, 1, N // 2), 2.0**30))
        for _ in range(B)
    ]
    b = bev.shard(CiphertextBatch.from_ciphertexts(cts))

    def run():
        with hem.mesh:
            return bev.rescale_to_next(bev.relinearize(bev.multiply(b, b), rk)).data

    dt = time_pipeline(run)
    return B / dt  # ciphertext-pipelines per second


def bfv_case(ndev):
    ctx, kg = build_bfv()
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    be = BatchEncoder(ctx)
    hem = make_mesh(ndev, limb_parallel=1)
    bev = BatchEvaluator(ctx, hem)
    B = PER_DEV * ndev
    t = ctx.first_context_data().parms.plain_modulus.value
    rng = np.random.default_rng(2)
    cts = [
        enc.encrypt_symmetric(be.encode(rng.integers(0, t, N, dtype=np.uint64)))
        for _ in range(B)
    ]
    b = bev.shard(CiphertextBatch.from_ciphertexts(cts))

    def run():
        with hem.mesh:
            return bev.multiply(b, b).data

    dt = time_pipeline(run)
    return B / dt


def main():
    print(f"devices: {len(jax.devices())}")
    rows = []
    for name, case in (("ckks_mult_relin_rescale", ckks_case), ("bfv_behz_multiply", bfv_case)):
        base = None
        for ndev in (1, 2, 4, 8):
            thr = case(ndev)
            if base is None:
                base = thr
            eff = thr / (base * ndev)
            rows.append((name, ndev, PER_DEV * ndev, thr, thr / base, eff))
            print(
                f"{name} ndev={ndev} B={PER_DEV*ndev} thr={thr:.2f} ct/s "
                f"speedup={thr/base:.2f}x eff={eff*100:.0f}%"
            )
    import json

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(
            [
                {"case": r[0], "ndev": r[1], "batch": r[2], "throughput": r[3],
                 "speedup": r[4], "efficiency": r[5]}
                for r in rows
            ],
            f, indent=1,
        )


if __name__ == "__main__":
    main()
