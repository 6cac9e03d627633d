#!/usr/bin/env python3
"""Interleaved A/B timing of the full BFV multiply under backend options.

Chip/tunnel load varies several-fold between processes, so backend
comparisons are only meaningful interleaved in one session: each round
times every variant once; report per-variant minima.

Usage: python benchmarks/bfv_ab.py [--n 8192] [--rounds 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from seal_tpu.context import SealContext
    from seal_tpu.encoders import BatchEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.profiling import chained_device_time_us, serialize_dependency

    n = args.n
    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        ctx = SealContext(parms, True, SecurityLevel.TC128)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, secret_key=kg.secret_key)
        be = BatchEncoder(ctx)
        ct1 = enc.encrypt_symmetric(be.encode(list(range(n))))
        ct2 = enc.encrypt_symmetric(be.encode(list(range(1, n + 1))))
    ct1.data = jax.device_put(ct1.data, target)
    ct2.data = jax.device_put(ct2.data, target)

    variants = [
        ("fbc=u128 ntt=auto", {"SEAL_TPU_FBC": "u128", "SEAL_TPU_NTT": "auto"}),
        ("fbc=mxu  ntt=auto", {"SEAL_TPU_FBC": "mxu", "SEAL_TPU_NTT": "auto"}),
        ("fbc=mxu  ntt=pallas", {"SEAL_TPU_FBC": "mxu", "SEAL_TPU_NTT": "pallas"}),
        ("fbc=u128 ntt=pallas", {"SEAL_TPU_FBC": "u128", "SEAL_TPU_NTT": "pallas"}),
    ]

    def scalar(x):
        return x[0].reshape(-1)[0]

    # Each variant gets its own jit cache (the env choice is trace-time);
    # swap the context's cache in before building/timing that variant.
    caches = {name: {} for name, _ in variants}
    ev = Evaluator(ctx, throw_on_transparent=False)

    def full(c):
        o = ct1.copy()
        o.data = c
        out = ev.multiply(o, ct2)
        return serialize_dependency(scalar(out.data), c, ct2.data)

    results = {name: [] for name, _ in variants}
    for r in range(args.rounds):
        for name, env in variants:
            os.environ.update(env)
            ctx._jit_cache = caches[name]
            us = chained_device_time_us(full, ct1.data, lo=4, hi=12, repeats=1)
            results[name].append(us)
            print(f"round {r} {name:22s} {us:9.1f} us", flush=True)
    print("--- minima ---")
    for name, _ in variants:
        print(f"{name:22s} {min(results[name]):9.1f} us")


if __name__ == "__main__":
    main()
