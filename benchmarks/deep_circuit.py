#!/usr/bin/env python3
"""Depth-8 relinearization/key-switch circuit at n=16384 (BASELINE.json
config: "BFV/CKKS n=16384 deep circuit: relin + key-switching at depth 8").

Evaluates x^(2^8) on CKKS via 8 square->relinearize->rescale levels and
reports total wall time per evaluation vs the reference CPU estimate.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from seal_tpu import (
        CoeffModulus, Decryptor, Encryptor, Evaluator, KeyGenerator,
        SealContext, SecurityLevel,
    )
    from seal_tpu.ckks_encoder import CKKSEncoder
    from seal_tpu.params import EncryptionParameters, SchemeType

    # (persistent compile cache intentionally not used: see run_all.py)

    n = 16384
    depth = 8
    bits = [60] + [40] * depth + [60]   # 9 data levels
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, bits))
        ctx = SealContext(parms, True, SecurityLevel.NONE)
        keygen = KeyGenerator(ctx)
        rk = keygen.create_relin_keys()
        enc = Encryptor(ctx, secret_key=keygen.secret_key)
        encoder = CKKSEncoder(ctx)
        scale = 2.0**40
        vals = np.full(n // 2, 1.0 + 2.0**-20)
        ct0 = enc.encrypt_symmetric(encoder.encode(vals, scale))

    target = jax.devices()[0]
    ct0.data = jax.device_put(ct0.data, target)
    for entry in rk.keys:
        if entry:
            entry["c0"] = jax.device_put(entry["c0"], target)
            entry["c1"] = jax.device_put(entry["c1"], target)

    ev = Evaluator(ctx, throw_on_transparent=False)

    def run(ct):
        for _ in range(depth):
            ct = ev.rescale_to_next(ev.relinearize(ev.square(ct), rk))
        return ct

    out = run(ct0)
    jax.block_until_ready(out.data)  # compile all levels

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(ct0)
    jax.block_until_ready(out.data)
    per_eval = (time.perf_counter() - t0) / iters

    # verify: (1 + 2^-20)^(2^8)
    with jax.default_device(cpu):
        dec = Decryptor(ctx, keygen.secret_key)
        got = encoder.decode(dec.decrypt(out)).real[0]
    want = (1.0 + 2.0**-20) ** (2**depth)
    print(json.dumps({
        "metric": "ckks_n16384_depth8_square_relin_rescale_s",
        "value": round(per_eval, 5),
        "unit": "s/eval (8 levels)",
        "result_rel_err": abs(got - want) / want,
    }))


if __name__ == "__main__":
    main()
