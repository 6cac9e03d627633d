"""Quick end-to-end surface check (verify skill step 1).

N=128 insecure params, all three schemes: keygen -> encrypt -> multiply ->
relinearize -> rotate -> decrypt, plus seeded-key serialization round trip.
"""

import numpy as np

from seal_tpu import serialization as S
from seal_tpu.context import SealContext
from seal_tpu.data import GaloisKeys, Plaintext, RelinKeys
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType

N = 128


def bfv_bgv(scheme):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(N, 20))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys(save_seed=True)
    gk = kg.create_galois_keys_from_steps([1], save_seed=True)
    # seeded key wire round-trip
    rk = S.kswitch_keys_load(S.kswitch_keys_save(rk, ctx), ctx, RelinKeys)[0]
    gk = S.kswitch_keys_load(S.kswitch_keys_save(gk, ctx), ctx, GaloisKeys)[0]
    enc = Encryptor(ctx, public_key=kg.create_public_key(), secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)
    t = parms.plain_modulus.value
    vals = np.arange(N, dtype=np.uint64) % np.uint64(t)
    ct = enc.encrypt(be.encode(vals))
    ct2 = ev.relinearize(ev.multiply(ct, ct), rk)
    out = np.asarray(be.decode(dec.decrypt(ct2)), dtype=np.uint64)
    np.testing.assert_array_equal(out, (vals * vals) % np.uint64(t))
    rot = ev.rotate_rows(ct, 1, gk)
    got = np.asarray(be.decode(dec.decrypt(rot)), dtype=np.uint64)
    half = N // 2
    want = np.concatenate([np.roll(vals[:half], -1), np.roll(vals[half:], -1)])
    np.testing.assert_array_equal(got, want)
    print(f"{scheme.name}: OK")


def ckks():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 40, 40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    rk = S.kswitch_keys_load(
        S.kswitch_keys_save(kg.create_relin_keys(save_seed=True), ctx), ctx, RelinKeys
    )[0]
    enc = Encryptor(ctx, public_key=kg.create_public_key(), secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    ce = CKKSEncoder(ctx)
    scale = 2.0**30
    vals = np.linspace(0.1, 1.0, N // 2)
    ct = enc.encrypt(ce.encode(vals, scale=scale))
    ct2 = ev.rescale_to_next(ev.relinearize(ev.multiply(ct, ct), rk))
    out = np.real(ce.decode(dec.decrypt(ct2)))
    np.testing.assert_allclose(out, vals * vals, atol=1e-4)
    print("CKKS: OK")


if __name__ == "__main__":
    bfv_bgv(SchemeType.BFV)
    bfv_bgv(SchemeType.BGV)
    ckks()
    print("surface: ALL OK")
