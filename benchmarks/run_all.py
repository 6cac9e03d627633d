#!/usr/bin/env python3
"""Full op-taxonomy benchmark, mirroring the reference's bench surface
(`native/bench/bench.cpp:135-226`, `8_performance.cpp:986-1090`).

Every ciphertext-domain op is timed with in-dispatch chaining
(`profiling.chained_device_time_us`): K iterations of the op inside ONE
jitted fori_loop, serialized by a compile-opaque data dependency.  This is
the only method that survives this environment's tunneled TPU backend,
whose per-dispatch enqueue round-trip (~267 us measured) exceeds the device
time of most ops — see docs/PERFORMANCE.md "timing reconciliation".

Host-boundary ops (encode/decode/encrypt/decrypt/keygen) are wall-clock
timed and dominated here by the ~1 MB/s dev tunnel; they are reported but
flagged, since a production host (PCIe DMA) does not see that cost.

Usage: python benchmarks/run_all.py [--sizes 4096,8192,16384,32768]
         [--schemes ckks,bfv,bgv] [--out BENCH_DETAIL.json] [--ntt]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # for sol.py


def _wall_us(fn, iters=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e6


def bench_scheme(scheme_name, n, chain_lo, chain_hi):
    import jax

    from seal_tpu.context import SealContext
    from seal_tpu.decryptor import Decryptor
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.profiling import chained_device_time_us, serialize_dependency
    from seal_tpu.random import UniformRandomGeneratorFactory, PRNGType

    scheme = {"bfv": SchemeType.BFV, "ckks": SchemeType.CKKS, "bgv": SchemeType.BGV}[scheme_name]
    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]

    with jax.default_device(cpu):
        parms = EncryptionParameters(scheme)
        parms.set_poly_modulus_degree(n)
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
        if n <= 32768:
            parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
            sec = SecurityLevel.TC128
        else:
            # beyond the HE-standard tables (N <= 32768); the reference also
            # requires sec_level none there (defines.h:52 + hestdparms.h)
            parms.set_coeff_modulus(CoeffModulus.create(n, [60, 40, 40, 60]))
            sec = SecurityLevel.NONE
        parms.set_random_generator(UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, tuple(range(8))))
        ctx = SealContext(parms, True, sec)
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

    # ship everything the chained bodies close over to the target device
    def put(x):
        return jax.device_put(x, target)

    ct1.data = put(ct1.data)
    ct2.data = put(ct2.data)
    keygen.secret_key.data = put(keygen.secret_key.data)
    if plain.rns_data is not None:
        plain.rns_data = put(plain.rns_data)
    for keyobj in (rk, gk):
        if keyobj is not None:
            for entry in keyobj.keys:
                if entry:
                    entry["c0"] = put(entry["c0"])
                    entry["c1"] = put(entry["c1"])

    ev = Evaluator(ctx, throw_on_transparent=False)
    prod = ev.multiply(ct1, ct2)
    prod_alt = ev.multiply(ct2, ct2)
    prod.data = put(prod.data)
    prod_alt.data = put(prod_alt.data)

    def like(proto, data):
        out = proto.copy()
        out.data = data
        return out

    def chained(step, init=None, lo=None, hi=None):
        if init is None:
            init = ct1.data
        return chained_device_time_us(
            step, init, lo=lo or chain_lo, hi=hi or chain_hi, repeats=3
        )

    def scalar(ct):
        return ct.data[0][0, 0, 0]

    res = {}
    res["_k"] = len(ctx.first_context_data().coeff_modulus_values)
    res["_k_key"] = len(ctx.key_context_data().coeff_modulus_values)

    # --- size-2 carry ops: carry is ct1.data, alternate is ct2.data -----
    def sized2(op):
        def step(carry):
            out = op(like(ct1, carry))
            return serialize_dependency(scalar(out), carry, ct2.data)

        return step

    res["add"] = chained(sized2(lambda c: ev.add(c, ct2)))
    res["sub"] = chained(sized2(lambda c: ev.sub(c, ct2)))
    res["negate"] = chained(sized2(ev.negate))
    res["multiply"] = chained(sized2(lambda c: ev.multiply(c, ct2)))
    res["square"] = chained(sized2(ev.square))
    res["add_plain"] = chained(sized2(lambda c: ev.add_plain(c, plain)))
    if scheme == SchemeType.CKKS or plain.rns_data is not None:
        res["multiply_plain"] = chained(sized2(lambda c: ev.multiply_plain(c, plain)))
    else:
        # BFV/BGV coefficient-form plain: the general plain-lift path
        res["multiply_plain"] = chained(sized2(lambda c: ev.multiply_plain(c, plain)))

    if ctx.using_keyswitching:
        if scheme == SchemeType.CKKS:
            res["rotate_one_step"] = chained(sized2(lambda c: ev.rotate_vector(c, 1, gk)))
        else:
            res["rotate_rows_one_step"] = chained(sized2(lambda c: ev.rotate_rows(c, 1, gk)))

        # --- size-3 carry: relinearize ---------------------------------
        def relin_step(carry):
            out = ev.relinearize(like(prod, carry), rk)
            return serialize_dependency(scalar(out), carry, prod_alt.data)

        res["relinearize"] = chained(relin_step, prod.data)

        # --- level-dropping ops: carry stays at the top level -----------
        def drop_step(op):
            def step(carry):
                out = op(like(ct1, carry))
                return serialize_dependency(scalar(out), carry, ct2.data)

            return step

        if scheme == SchemeType.CKKS:
            ct_scaled = like(ct1, ct1.data)
            ct_scaled.scale = float(ct1.scale) * float(ct1.scale)
            res["rescale"] = chained(drop_step(lambda c: ev.rescale_to_next(c)))
        else:
            res["mod_switch"] = chained(drop_step(ev.mod_switch_to_next))

    if scheme == SchemeType.BFV:
        def to_ntt_step(carry):
            out = ev.transform_to_ntt(like(ct1, carry))
            return serialize_dependency(scalar(out), carry, ct2.data)

        res["to_ntt"] = chained(to_ntt_step)
        ct1_ntt = ev.transform_to_ntt(ct1)
        ct2_ntt = ev.transform_to_ntt(ct2)

        def from_ntt_step(carry):
            out = ev.transform_from_ntt(like(ct1_ntt, carry))
            return serialize_dependency(scalar(out), carry, ct2_ntt.data)

        res["from_ntt"] = chained(from_ntt_step, ct1_ntt.data)

    # --- host-boundary ops (wall clock; tunnel-dominated here) ----------
    if scheme == SchemeType.CKKS:
        res["encode_host"] = _wall_us(lambda: encoder.encode(vals, scale), 3)
        pt = dec.decrypt(ct1)
        res["decode_host"] = _wall_us(lambda: encoder.decode(pt), 3)
    else:
        res["encode_host"] = _wall_us(lambda: encoder.encode(vals), 3)
        pt = dec.decrypt(ct1)
        res["decode_host"] = _wall_us(lambda: encoder.decode(pt), 3)
    res["encrypt_host"] = _wall_us(lambda: enc.encrypt_symmetric(plain), 3)
    res["decrypt_host"] = _wall_us(lambda: dec.decrypt(ct1), 3)

    return res


def bench_keygen(n):
    """KeyGen rows (bench/keygen.cpp): secret/public/relin/galois, wall-clock.

    Keygen is host-orchestrated (PRNG expansion + device NTTs); wall-clock is
    the honest metric — a user calls it once, not in a pipeline.  Numbers
    here include the dev tunnel's transfer cost on this environment.
    """
    import jax

    from seal_tpu.context import SealContext
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType

    # keygen itself runs on the accelerator: since round 4 the whole
    # sampling pipeline (blake2xb expansion, rejection, CBD) is device
    # code (ops/blake2_dev.py) — pinning it to the CPU backend (the old
    # host-orchestrated-era setup) would bench XLA:CPU instead.
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
    ctx = SealContext(parms, True, SecurityLevel.TC128)
    res = {}
    res["secret"] = _wall_us(lambda: KeyGenerator(ctx), 3)
    keygen = KeyGenerator(ctx)
    res["public"] = _wall_us(lambda: keygen.create_public_key(), 3)
    if ctx.using_keyswitching:
        res["relin"] = _wall_us(lambda: keygen.create_relin_keys(), 3)
        res["galois_one_step"] = _wall_us(
            lambda: keygen.create_galois_keys_from_steps([1]), 3
        )
    return res


def bench_ntt(n, chain_lo, chain_hi):
    """NTT microbench: forward/inverse over the default chain's k limbs."""
    import jax
    import jax.numpy as jnp

    from seal_tpu.context import SealContext
    from seal_tpu.modulus import CoeffModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.ops import ntt as NTT
    from seal_tpu.profiling import chained_device_time_us

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        if n <= 32768:
            parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
            sec = SecurityLevel.TC128
        else:
            parms.set_coeff_modulus(CoeffModulus.create(n, [60, 40, 40, 60]))
            sec = SecurityLevel.NONE
        ctx = SealContext(parms, True, sec)
        cd = ctx.first_context_data()
        t = cd.limb_tables()
        k = len(cd.coeff_modulus_values)
        rng = np.random.default_rng(1)
        x64 = rng.integers(0, np.array(cd.coeff_modulus_values)[:, None], (k, n), dtype=np.uint64)
        x = (x64.astype(np.uint32), (x64 >> np.uint64(32)).astype(np.uint32))

    t = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, target) if hasattr(a, "shape") else a, t
    )
    x = jax.device_put((jnp.asarray(x[0]), jnp.asarray(x[1])), target)

    # forward output is in [0,q): feeds the next iteration directly, so the
    # chain is naturally serialized with no select needed
    fwd = chained_device_time_us(lambda c: NTT.ntt_forward(c, t), x, lo=chain_lo, hi=chain_hi, repeats=3)
    inv = chained_device_time_us(lambda c: NTT.ntt_inverse(c, t), x, lo=chain_lo, hi=chain_hi, repeats=3)
    return {"ntt_forward": fwd, "ntt_inverse": inv, "k": k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192,16384,32768")
    ap.add_argument("--schemes", default="ckks,bfv,bgv")
    ap.add_argument("--lo", type=int, default=5)
    ap.add_argument("--hi", type=int, default=45)
    ap.add_argument("--ntt", action="store_true", help="also run the NTT microbench")
    ap.add_argument("--keygen", action="store_true", help="also run keygen rows")
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    args = ap.parse_args()

    baseline = {}
    bp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE_CPU.json")
    if os.path.exists(bp):
        baseline = json.load(open(bp))

    all_results = {}
    if os.path.exists(args.out):
        try:
            all_results = json.load(open(args.out))
        except Exception:
            all_results = {}
    all_results.setdefault("_method", "in-dispatch chained fori_loop slope (profiling.chained_device_time_us)")

    for scheme in args.schemes.split(","):
        if not scheme:
            continue
        for size in (int(s) for s in args.sizes.split(",")):
            print(f"=== {scheme} n={size} ===", flush=True)
            res = bench_scheme(scheme, size, args.lo, args.hi)
            all_results[f"{scheme}_{size}"] = res
            base = baseline.get(scheme, {}).get(str(size), {})
            from sol import op_sol_us

            k = res.get("_k", 1)
            k_key = res.get("_k_key", k + 1)
            for op, us in sorted(res.items()):
                if op.startswith("_"):
                    continue
                b = base.get(op) or base.get(op.replace("_rows", "").replace("_one_step", " one step"))
                speed = f"  {b / us:8.1f}x vs CPU" if b and us else ""
                sol = op_sol_us(op, scheme, size, k, k_key)
                solcol = f"  sol {sol:8.1f} us ({100 * sol / us:5.1f}% SoL)" if sol and us else ""
                print(f"  {op:24s} {us:10.1f} us{speed}{solcol}", flush=True)
            with open(args.out, "w") as f:
                json.dump(all_results, f, indent=2)

    if args.ntt:
        from sol import ntt_cost_us

        for size in (int(s) for s in args.sizes.split(",")):
            print(f"=== ntt n={size} ===", flush=True)
            res = bench_ntt(size, args.lo, max(args.hi, 13))
            all_results[f"ntt_{size}"] = res
            sol = ntt_cost_us(size, res["k"])
            res["sol_us"] = sol["sol_us"]
            base = baseline.get("ntt", {}).get(str(size), {})
            for op, us in sorted(res.items()):
                if op in ("k", "sol_us"):
                    continue
                b = base.get(op.replace("ntt_", ""))
                speed = f"  {b / us:8.1f}x vs CPU" if b and us else ""
                print(f"  {op:24s} {us:10.1f}{speed}  sol {sol['sol_us']:6.1f} us ({100 * sol['sol_us'] / us:5.1f}% SoL)", flush=True)
            with open(args.out, "w") as f:
                json.dump(all_results, f, indent=2)

    if args.keygen:
        for size in (int(s) for s in args.sizes.split(",")):
            print(f"=== keygen n={size} ===", flush=True)
            res = bench_keygen(size)
            all_results[f"keygen_{size}"] = res
            base = baseline.get("keygen", {}).get(str(size), {})
            for op, us in sorted(res.items()):
                b = base.get(op)
                speed = f"  {b / us:8.1f}x vs CPU" if b and us else ""
                print(f"  {op:24s} {us:10.1f} us{speed}", flush=True)
            with open(args.out, "w") as f:
                json.dump(all_results, f, indent=2)

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
