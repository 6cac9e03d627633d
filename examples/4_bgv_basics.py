#!/usr/bin/env python3
"""BGV basics: x^4 via two multiplications with modulus switching.

Mirrors the reference's ``4_bgv_basics.cpp`` workload.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.utils import print_parameters


def main():
    parms = EncryptionParameters(SchemeType.BGV)
    n = 8192
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
    parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
    context = SealContext(parms)
    print_parameters(context)

    keygen = KeyGenerator(context)
    pk = keygen.create_public_key()
    rk = keygen.create_relin_keys()
    encryptor = Encryptor(context, public_key=pk)
    evaluator = Evaluator(context)
    decryptor = Decryptor(context, keygen.secret_key)
    encoder = BatchEncoder(context)

    vals = list(range(encoder.slots))
    x = encryptor.encrypt(encoder.encode(vals))
    print(f"fresh noise budget: {decryptor.invariant_noise_budget(x)} bits")

    x2 = evaluator.relinearize(evaluator.square(x), rk)
    print(f"x^2 noise budget: {decryptor.invariant_noise_budget(x2)} bits")
    x2 = evaluator.mod_switch_to_next(x2)
    print(f"x^2 after mod switch: {decryptor.invariant_noise_budget(x2)} bits")
    x4 = evaluator.relinearize(evaluator.square(x2), rk)
    print(f"x^4 noise budget: {decryptor.invariant_noise_budget(x4)} bits")

    t = context.first_context_data().parms.plain_modulus.value
    got = encoder.decode(decryptor.decrypt(x4))
    want = [pow(v, 4, t) for v in vals]
    assert list(got) == want
    print("OK")


if __name__ == "__main__":
    main()
