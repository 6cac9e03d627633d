"""SEAL_TPU_DEBUG=1 assert mode (the SEAL_DEBUG analog, util/ntt.h:200-209).

Runs in a subprocess so the env flag is read at import time, exactly as a
user would enable it.  One good path (battery passes under checks) and one
violation path (out-of-range NTT operand raises RangeError).
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["SEAL_TPU_DEBUG"] = "1"
    # sitecustomize re-sets JAX_PLATFORMS=axon; force CPU via jax.config,
    # same as tests/conftest.py (debug callbacks need a local backend)
    prelude = 'import jax; jax.config.update("jax_platforms", "cpu")\n'
    return subprocess.run(
        [sys.executable, "-c", prelude + textwrap.dedent(code)],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )


def test_debug_mode_clean_roundtrip_passes():
    out = _run("""
        import numpy as np
        from seal_tpu.context import SealContext
        from seal_tpu.params import EncryptionParameters, SchemeType
        from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
        from seal_tpu.keygen import KeyGenerator
        from seal_tpu.encryptor import Encryptor
        from seal_tpu.decryptor import Decryptor
        from seal_tpu.evaluator import Evaluator
        from seal_tpu.encoders import BatchEncoder

        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(128)
        parms.set_coeff_modulus(CoeffModulus.create(128, [40, 40, 40]))
        parms.set_plain_modulus(PlainModulus.batching(128, 14).value)
        ctx = SealContext(parms, True, SecurityLevel.NONE)
        kg = KeyGenerator(ctx)
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, secret_key=kg.secret_key)
        dec = Decryptor(ctx, kg.secret_key)
        ev = Evaluator(ctx)
        encoder = BatchEncoder(ctx)
        t = parms.plain_modulus.value
        vals = list(range(128))
        ct = enc.encrypt_symmetric(encoder.encode(vals))
        prod = ev.relinearize(ev.multiply(ct, ct), rk)
        got = encoder.decode(dec.decrypt(prod))
        np.testing.assert_array_equal(got, [v * v % t for v in vals])
        print("DEBUG_CLEAN_OK")
    """)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DEBUG_CLEAN_OK" in out.stdout


def test_debug_mode_catches_out_of_range_ntt_input():
    out = _run("""
        import numpy as np
        from seal_tpu.modulus import CoeffModulus
        from seal_tpu.ntt_tables import build_limb_tables
        from seal_tpu.ops import ntt as NTT
        from seal_tpu.ops import u64 as U
        from seal_tpu import debug

        mods = CoeffModulus.create(256, [30])
        tables = build_limb_tables(8, mods)
        # coefficient >= 4q violates the ntt_negacyclic_harvey operand bound
        bad = np.full((1, 256), 8 * mods[0].value, dtype=np.uint64)
        try:
            y = NTT.ntt_forward(U.from_np_u64(bad), tables)
            np.asarray(y[0])  # force execution so the callback fires
            print("NO_RAISE")
        except Exception as e:
            print("CAUGHT", type(e).__name__, str(e)[:80])
    """)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CAUGHT" in out.stdout and "range violation" in out.stdout
