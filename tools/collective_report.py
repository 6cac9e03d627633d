#!/usr/bin/env python3
"""Measure inter-chip collective traffic per sharded op from compiled HLO.

VERDICT r2 #4: the >=80% multi-chip scaling-efficiency north star was
asserted without numbers.  This tool compiles the sharded hot ops over a
virtual limb-sharded mesh, walks the *optimized* HLO for collective
instructions (all-reduce / all-gather / reduce-scatter / all-to-all /
collective-permute), sums the bytes each moves, and projects scaling
efficiency against the op's compute time measured on the real chip:

    t_comm  = collective bytes / ICI_BW        (v5e: 4x45 GB/s links)
    eff     >= t_comp / (t_comp + t_comm)      (zero-overlap lower bound)

Outputs SCALING_COMM.json; the derived table lives in SCALING.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/collective_report.py --n 8192 [--devices 8]
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"u32": 4, "s32": 4, "u64": 8, "f32": 4, "u8": 1, "s8": 1,
               "pred": 1, "u16": 2, "s16": 2, "bf16": 2}

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective instruction in optimized HLO."""
    out = {c: 0 for c in COLLECTIVES}
    counts = {c: 0 for c in COLLECTIVES}
    shape_pat = re.compile(r"(\w+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(.*?)\s+(" + "|".join(COLLECTIVES) + r")(-start|-done)?\(", line)
        if not m or (m.group(3) == "-done"):
            continue  # count -start (or plain), skip the matching -done
        op = m.group(2)
        total = 0
        for sm in shape_pat.finditer(m.group(1)):
            dt, dims = sm.group(1), sm.group(2)
            nel = 1
            for d in dims.split(","):
                if d:
                    nel *= int(d)
            total += nel * DTYPE_BYTES.get(dt, 4)
        out[op] += total
        counts[op] += 1
    return {"bytes_by_op": out, "counts": counts,
            "total_bytes": sum(out.values())}


def analyze(fn, args_sharded, label, static_argnums=()):
    import jax

    jitted = jax.jit(fn, static_argnums=static_argnums)
    compiled = jitted.lower(*args_sharded).compile()
    rep = collective_bytes(compiled.as_text())
    rep["label"] = label
    print(f"{label:28s} collectives: {rep['total_bytes']:>12,} B  "
          + " ".join(f"{k}={v}" for k, v in rep["counts"].items() if v), flush=True)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default="SCALING_COMM.json")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from seal_tpu.context import SealContext
    from seal_tpu.encoders import BatchEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.ops import ntt as NTT
    from seal_tpu.ops import rns as R

    n = args.n
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
    parms.set_plain_modulus(PlainModulus.batching(n, 20))
    ctx = SealContext(parms, True, SecurityLevel.TC128)
    cd = ctx.first_context_data()
    tool = cd.rns_tool
    k = len(cd.coeff_modulus_values)
    k_key = len(ctx.key_context_data().coeff_modulus_values)

    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    be = BatchEncoder(ctx)
    ct = enc.encrypt_symmetric(be.encode(list(range(n))))
    ev = Evaluator(ctx, throw_on_transparent=False)
    prod = ev.multiply(ct, ct)  # size-3 input for key switch

    # the limb axis must divide k (data limbs); at n=8192 the default chain
    # has k=4, so an 8-device request folds to a 4-way limb mesh
    limb_sz = args.devices
    while k % limb_sz:
        limb_sz //= 2
    mesh = Mesh(np.array(jax.devices()[:limb_sz]), ("limb",))
    print(f"mesh: {limb_sz}-way limb axis (k={k}, k_key={k_key})")
    limb_ct = NamedSharding(mesh, P(None, "limb", None))      # (size, k, n)
    limb_key = NamedSharding(mesh, P("limb", None, None))     # (D, k_key, n): D sharded
    repl = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), x)

    key = rk.key(2)
    reports = {"n": n, "k": k, "k_key": k_key, "devices": args.devices, "ops": []}

    with mesh:
        # 1. key switch (relinearize body): the #1 hot compound kernel
        data3 = put(prod.data, limb_ct)
        target = put((prod.data[0][2], prod.data[1][2]), NamedSharding(mesh, P("limb", None)))
        kc0 = put(key["c0"], limb_key)
        kc1 = put(key["c1"], limb_key)

        def switch_key(d, tgt, c0, c1):
            trimmed = (d[0][:2], d[1][:2])
            return ev._switch_key_body(cd, 2, trimmed, tgt, c0, c1)

        reports["ops"].append(analyze(switch_key, (data3, target, kc0, kc1),
                                      f"key_switch n={n} k={k}"))

        # 2. BEHZ base extension q -> Bsk (the base-conversion contraction)
        x1 = put(ct.data, limb_ct)

        def behz_extend(d):
            return R.sm_mrq(R.fastbconv_m_tilde(d, tool), tool)

        reports["ops"].append(analyze(behz_extend, (x1,),
                                      f"behz_extend n={n} k={k}"))

        # 3. batched forward NTT over limb-sharded ciphertext (no comm expected)
        def fwd(d):
            return NTT.ntt_forward(d, cd.limb_tables(), lazy=True)

        reports["ops"].append(analyze(fwd, (x1,), f"ntt_forward n={n} k={k}"))

        # 4. distributed single-transform NTT corner turn at n=65536
        from seal_tpu import numth
        from seal_tpu.modulus import Modulus
        from seal_tpu.ntt_tables import build_mxu_tables
        from seal_tpu.ops import u64 as U
        from seal_tpu.parallel.dist_ntt import dist_ntt_forward

        n_big = 65536
        mods = [Modulus(p) for p in numth.get_primes(2 * n_big, 50, 2)]
        mt = build_mxu_tables(int(n_big).bit_length() - 1, mods)
        qv = np.array([m.value for m in mods], dtype=np.uint64)
        xb = np.random.default_rng(0).integers(0, qv[:, None], (2, n_big), dtype=np.uint64)
        xbd = put(U.from_np_u64(xb), repl)
        dist_mesh = Mesh(np.array(jax.devices()[: args.devices]), ("limb",))
        xbd = put(U.from_np_u64(xb), NamedSharding(dist_mesh, P()))
        with dist_mesh:
            reports["ops"].append(analyze(
                lambda d: dist_ntt_forward(d, mt, dist_mesh),
                (xbd,), f"dist_ntt n={n_big} k=2 P={args.devices}"))

    with open(args.out, "w") as f:
        json.dump(reports, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
