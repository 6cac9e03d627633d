#!/usr/bin/env python3
"""BASELINE.json named config: "n=32768 CKKS batched inference".

Pushes a batch of B ciphertexts (CiphertextBatch, the ciphertext-batch
data-parallel axis of SURVEY.md §2.12) through multiply_plain -> rotate ->
multiply+relinearize+rescale — the inner loop of an encrypted linear layer —
and reports per-ciphertext amortized device time.  Single chip here; the
batch axis is the one that shards over a pod with zero communication.

Usage: python benchmarks/batched_32768.py [--batch 4] [--n 32768]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n", type=int, default=32768)
    args = ap.parse_args()

    import jax

    from seal_tpu.context import SealContext
    from seal_tpu.ckks_encoder import CKKSEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.parallel.batch import BatchEvaluator, CiphertextBatch
    from seal_tpu.profiling import chained_device_time_us, serialize_dependency

    n = args.n
    B = args.batch
    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        ctx = SealContext(parms, True, SecurityLevel.TC128)
        keygen = KeyGenerator(ctx)
        rk = keygen.create_relin_keys()
        gk = keygen.create_galois_keys_from_steps([1])
        enc = Encryptor(ctx, secret_key=keygen.secret_key)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 40
        vals = np.linspace(0, 1, n // 2)
        pt = encoder.encode(vals, scale)
        cts = [enc.encrypt_symmetric(pt) for _ in range(B)]

    def put(x):
        return jax.device_put(x, target)

    for ct in cts:
        ct.data = put(ct.data)
    pt.rns_data = put(pt.rns_data)
    for keyobj in (rk, gk):
        for entry in keyobj.keys:
            if entry:
                entry["c0"] = put(entry["c0"])
                entry["c1"] = put(entry["c1"])

    bev = BatchEvaluator(ctx)
    batch = CiphertextBatch.from_ciphertexts(cts)
    alt = CiphertextBatch.from_ciphertexts(list(reversed(cts)))

    def like(data):
        return CiphertextBatch(data, batch.parms_id, batch.is_ntt_form,
                               batch.scale, batch.correction_factor)

    def step(carry):
        b = like(carry)
        b = bev.multiply_plain(b, pt)
        b = bev.rotate_vector(b, 1, gk)
        prod = bev.multiply(b, like(carry))
        prod = bev.relinearize(prod, rk)
        # keep the carry at the top level: rescale result is only used
        # through the serialization scalar, the carry itself stays put
        out_scalar = bev.rescale_to_next(prod).data[0][0, 0, 0, 0]
        return serialize_dependency(out_scalar, carry, alt.data)

    us = chained_device_time_us(step, batch.data, lo=3, hi=11, repeats=3)
    per_ct = us / B
    print(json.dumps({
        "metric": f"ckks_n{n}_batched_linear_layer_us_per_ct",
        "value": round(per_ct, 1),
        "unit": "us/ct",
        "batch": B,
        "pipeline": "mul_plain+rotate+mul+relin+rescale",
        "total_us_per_step": round(us, 1),
    }))


if __name__ == "__main__":
    main()
