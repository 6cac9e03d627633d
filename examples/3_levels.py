#!/usr/bin/env python3
"""Levels: the modulus switching chain, parms_ids, and key/data levels.

Mirrors the reference's ``3_levels.cpp``.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus
from seal_tpu.params import EncryptionParameters, SchemeType


def main():
    parms = EncryptionParameters(SchemeType.BFV)
    n = 8192
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [50, 30, 30, 50, 50]))
    parms.set_plain_modulus(1 << 20)
    ctx = SealContext(parms)

    print("Modulus switching chain (key level first):")
    cd = ctx.key_context_data()
    while cd is not None:
        tag = ""
        if cd.parms_id == ctx.key_parms_id:
            tag = " (key level)"
        elif cd.parms_id == ctx.first_parms_id:
            tag = " (first/data level)"
        bits = [m.bit_count for m in cd.parms.coeff_modulus]
        print(f"  chain_index {cd.chain_index}: {len(bits)} primes {bits}{tag}")
        cd = cd.next_context_data

    keygen = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)

    p = Plaintext.from_hex("1x^3 + 2x^2 + 3x^1 + 4")
    ct = enc.encrypt(p)
    while True:
        print(f"  level {ctx.get_context_data(ct.parms_id).chain_index}: "
              f"noise budget {dec.invariant_noise_budget(ct)} bits")
        if ct.parms_id == ctx.last_parms_id:
            break
        ct = ev.mod_switch_to_next(ct)
    assert dec.decrypt(ct).to_string() == p.to_string()
    print("OK")


if __name__ == "__main__":
    main()
