#!/usr/bin/env python3
"""Full op-taxonomy benchmark, mirroring the reference's 8_performance.cpp.

Times every scheme x op x size on the default JAX device (TPU when present),
compares against the reference's CPU numbers in BASELINE_CPU.json, writes
BENCH_DETAIL.json, and prints a table.  Setup (context, keys, host sampling)
runs on CPU; only op execution is timed, averaged over ``--iters`` runs after
a warmup, matching the reference's harness conventions (BASELINE.md).

Usage: python benchmarks/run_all.py [--sizes 4096,8192] [--schemes ckks,bfv,bgv] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    """Disabled: the persistent cache produced cross-machine XLA:CPU AOT
    loads with mismatched CPU features (SIGILL risk) in this environment."""
    return


def timeit(fn, iters, *args):
    """Slope-timed device microseconds per call (host-fetch barriers;
    ``jax.block_until_ready`` is not a reliable completion barrier on this
    environment's tunneled TPU backend — see seal_tpu/profiling.py)."""
    from seal_tpu.profiling import device_time_us

    lo = max(2, iters // 3)
    return device_time_us(fn, *args, lo=lo, hi=lo + iters, repeats=2)


def bench_scheme(scheme_name, n, iters):
    import jax

    from seal_tpu.context import SealContext
    from seal_tpu.decryptor import Decryptor
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.random import UniformRandomGeneratorFactory, PRNGType

    scheme = {"bfv": SchemeType.BFV, "ckks": SchemeType.CKKS, "bgv": SchemeType.BGV}[scheme_name]
    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]

    with jax.default_device(cpu):
        parms = EncryptionParameters(scheme)
        parms.set_poly_modulus_degree(n)
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_random_generator(UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, tuple(range(8))))
        ctx = SealContext(parms, True, SecurityLevel.TC128)
        assert ctx.parameters_set, ctx.parameter_error_message()
        keygen = KeyGenerator(ctx)
        rk = keygen.create_relin_keys() if ctx.using_keyswitching else None
        gk = keygen.create_galois_keys_from_steps([1]) if ctx.using_keyswitching else None
        enc = Encryptor(ctx, secret_key=keygen.secret_key)
        dec = Decryptor(ctx, keygen.secret_key)

        if scheme == SchemeType.CKKS:
            from seal_tpu.ckks_encoder import CKKSEncoder

            encoder = CKKSEncoder(ctx)
            scale = np.sqrt(float(ctx.first_context_data().coeff_modulus_values[-1]))
            vals = np.linspace(0, 1, n // 2)
            plain = encoder.encode(vals, scale)
        else:
            from seal_tpu.encoders import BatchEncoder

            encoder = BatchEncoder(ctx)
            vals = list(range(n))
            plain = encoder.encode(vals)
        ct1 = enc.encrypt_symmetric(plain)
        ct2 = enc.encrypt_symmetric(plain)

    # move ciphertexts and keys to the target device (incl. the secret key,
    # so encrypt/decrypt don't re-upload it per call)
    ct1.data = jax.device_put(ct1.data, target)
    ct2.data = jax.device_put(ct2.data, target)
    keygen.secret_key.data = jax.device_put(keygen.secret_key.data, target)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)
    if plain.rns_data is not None:
        plain.rns_data = jax.device_put(plain.rns_data, target)
    if rk is not None:
        for entry in rk.keys:
            if entry:
                entry["c0"] = jax.device_put(entry["c0"], target)
                entry["c1"] = jax.device_put(entry["c1"], target)
        for entry in gk.keys:
            if entry:
                entry["c0"] = jax.device_put(entry["c0"], target)
                entry["c1"] = jax.device_put(entry["c1"], target)

    ev = Evaluator(ctx, throw_on_transparent=False)
    res = {}

    res["add"] = timeit(lambda: ev.add(ct1, ct2).data, iters)
    prod = ev.multiply(ct1, ct2)
    res["multiply"] = timeit(lambda: ev.multiply(ct1, ct2).data, iters)
    res["square"] = timeit(lambda: ev.square(ct1).data, iters)
    if scheme == SchemeType.CKKS:
        pt_dev = plain.copy()
        pt_dev.rns_data = jax.device_put(plain.rns_data, target)
        res["multiply_plain"] = timeit(lambda: ev.multiply_plain(ct1, pt_dev).data, iters)
        res["rescale"] = timeit(lambda: ev.rescale_to_next(prod).data, iters)
    if rk is not None:
        res["relinearize"] = timeit(lambda: ev.relinearize(prod, rk).data, iters)
        if scheme == SchemeType.CKKS:
            res["rotate_one_step"] = timeit(lambda: ev.rotate_vector(ct1, 1, gk).data, iters)
        else:
            res["rotate_rows_one_step"] = timeit(lambda: ev.rotate_rows(ct1, 1, gk).data, iters)
    if scheme in (SchemeType.BFV,):
        res["mod_switch"] = timeit(lambda: ev.mod_switch_to_next(ct1).data, iters)

    # host-side encode/decode + full encrypt/decrypt (includes host sampling)
    t0 = time.perf_counter()
    for _ in range(max(2, iters // 2)):
        if scheme == SchemeType.CKKS:
            encoder.encode(vals, scale)
        else:
            encoder.encode(vals)
    res["encode"] = (time.perf_counter() - t0) / max(2, iters // 2) * 1e6

    t0 = time.perf_counter()
    for _ in range(max(2, iters // 2)):
        enc.encrypt_symmetric(plain)
    res["encrypt"] = (time.perf_counter() - t0) / max(2, iters // 2) * 1e6

    t0 = time.perf_counter()
    for _ in range(max(2, iters // 2)):
        dec.decrypt(ct1)
    res["decrypt"] = (time.perf_counter() - t0) / max(2, iters // 2) * 1e6

    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192,16384")
    ap.add_argument("--schemes", default="ckks,bfv,bgv")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    args = ap.parse_args()

    _enable_compile_cache()
    baseline = {}
    bp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE_CPU.json")
    if os.path.exists(bp):
        baseline = json.load(open(bp))

    all_results = {}
    for scheme in args.schemes.split(","):
        for size in (int(s) for s in args.sizes.split(",")):
            print(f"=== {scheme} n={size} ===", flush=True)
            res = bench_scheme(scheme, size, args.iters)
            all_results[f"{scheme}_{size}"] = res
            base = baseline.get(scheme, {}).get(str(size), {})
            for op, us in sorted(res.items()):
                b = base.get(op) or base.get(op.replace("_rows", "").replace("_one_step", " one step"))
                speed = f"  {b / us:8.1f}x vs CPU" if b else ""
                print(f"  {op:24s} {us:10.1f} us{speed}", flush=True)

    with open(args.out, "w") as f:
        json.dump(all_results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
