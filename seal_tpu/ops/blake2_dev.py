"""Device-side blake2xb XOF expansion + RLWE samplers (TPU, u32 lanes).

The reference generates every random polynomial by pulling bytes from a
counter-mode blake2xb PRNG on the host (``randomgen.cpp:204-214``,
``util/rlwe.cpp:21-135``).  On TPU that host stream is the keygen/encrypt
bottleneck twice over: blake2xb is ~200 MB/s single-threaded, and the
expanded polynomials (8·k·n bytes per uniform c1) must then cross the
host→device link.  But the construction is counter-mode: every 4 KiB
buffer — and every 64-byte output node inside it — is an independent
blake2b compression, so the whole expansion is embarrassingly parallel
and belongs on the device, where only the 64-byte *seed* has to travel.

This module implements the blake2b compression function on u64-in-2xu32
lanes (the same emulation as ops/u64.py), vectorized over (stream,
buffer, node) lanes, plus the three byte-stream consumers needed by
keygen/encrypt:

  * ``uniform_from_seed_words`` — ``sample_poly_uniform`` (rlwe.cpp:104)
    incl. the sequential per-coefficient rejection redraws, reformulated
    order-exactly: the m-th rejected bulk position (scan order) ends up
    with the m-th acceptable word of the continuation stream, so the
    fix-up is a rank/compaction gather instead of a serial loop.
  * ``cbd_noise_from_words`` — ``sample_poly_cbd`` (rlwe.cpp:66),
    byte-exact popcount form.
  * ``expand_stream_words`` — the raw XOF, byte-identical to the
    reference's ``Blake2xbPRNG`` stream (verified against
    native/blake2.c in tests/test_blake2_dev.py).

Everything is trace-friendly; rejection-tail exhaustion (probability
~2^-1000 for the provisioned tails) is reported as an ``overflow`` flag
so callers can fall back to the host sampler instead of mis-sampling.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import u64 as U

U64 = U.U64

_IV = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
]

_BUFFER = 4096            # bytes per counter block (Blake2xbPRNG buffer)
_WORDS_PER_BUFFER = 512   # u64 words


def _xor64(x: U64, y: U64) -> U64:
    return x[0] ^ y[0], x[1] ^ y[1]


def _rotr64(x: U64, c: int) -> U64:
    lo, hi = x
    if c == 32:
        return hi, lo
    if c < 32:
        return ((lo >> c) | (hi << (32 - c)), (hi >> c) | (lo << (32 - c)))
    d = c - 32
    return ((hi >> d) | (lo << (32 - d)), (lo >> d) | (hi << (32 - d)))


def _const64(value: int, like: jnp.ndarray) -> U64:
    return (jnp.full_like(like, value & 0xFFFFFFFF),
            jnp.full_like(like, (value >> 32) & 0xFFFFFFFF))


def _compress(h: List[U64], m: List[U64], t0: int, last: bool) -> List[U64]:
    """blake2b compression F(h, m, t=(t0, 0), last); all lanes vectorized.

    ``h``: 8 u64 lane arrays; ``m``: 16 u64 lane arrays (broadcastable).
    cf. native/blake2.c:b2b_compress (RFC 7693 §3.2).  The 12 rounds run
    under ``lax.scan`` (one compiled round body, the per-round SIGMA
    permutation applied as a 16-row gather) so tracing this ~400-op body
    once replaces a ~5k-op unrolled graph — compile time matters because
    every (shape, stream-length) pair retraces.
    """
    like = jnp.zeros_like(h[0][0])
    # broadcast message words to full lane shape so the scanned gather is
    # uniform
    m_lo = jnp.stack([x[0] + like for x in m])  # (16, ...)
    m_hi = jnp.stack([x[1] + like for x in m])
    sigma = jnp.asarray(np.array(_SIGMA, dtype=np.int32))

    v = [(x[0] + like, x[1] + like) for x in h]
    v += [_const64(_IV[i], h[0][0]) for i in range(8)]
    v = [(x[0] + like, x[1] + like) for x in v]
    v[12] = _xor64(v[12], _const64(t0, like))
    if last:
        v[14] = (v[14][0] ^ jnp.uint32(0xFFFFFFFF), v[14][1] ^ jnp.uint32(0xFFFFFFFF))

    def round_body(carry, sel):
        v = [(carry[2 * i], carry[2 * i + 1]) for i in range(16)]
        mr_lo = m_lo[sel]
        mr_hi = m_hi[sel]

        def G(a, b, c, d, xi, yi):
            x = (mr_lo[xi], mr_hi[xi])
            y = (mr_lo[yi], mr_hi[yi])
            va, vb, vc, vd = v[a], v[b], v[c], v[d]
            va = U.add64(U.add64(va, vb), x)
            vd = _rotr64(_xor64(vd, va), 32)
            vc = U.add64(vc, vd)
            vb = _rotr64(_xor64(vb, vc), 24)
            va = U.add64(U.add64(va, vb), y)
            vd = _rotr64(_xor64(vd, va), 16)
            vc = U.add64(vc, vd)
            vb = _rotr64(_xor64(vb, vc), 63)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd

        G(0, 4, 8, 12, 0, 1)
        G(1, 5, 9, 13, 2, 3)
        G(2, 6, 10, 14, 4, 5)
        G(3, 7, 11, 15, 6, 7)
        G(0, 5, 10, 15, 8, 9)
        G(1, 6, 11, 12, 10, 11)
        G(2, 7, 8, 13, 12, 13)
        G(3, 4, 9, 14, 14, 15)
        return tuple(w for pair in v for w in pair), None

    carry0 = tuple(w for pair in v for w in pair)
    carry, _ = jax.lax.scan(round_body, carry0, sigma)
    v = [(carry[2 * i], carry[2 * i + 1]) for i in range(16)]
    return [_xor64(_xor64(h[i], v[i]), v[i + 8]) for i in range(8)]


def _root_param_h0(like: jnp.ndarray) -> List[U64]:
    """h init for the xb root hash: digest 64, key 64, fanout 1, depth 1,
    xof_length = 4096 (native/blake2.c:176-192)."""
    pb = [0] * 8
    pb[0] = 64 | (64 << 8) | (1 << 16) | (1 << 24)
    pb[1] = _BUFFER << 32  # node_offset 0 | xof_length 4096
    return [_const64(_IV[i] ^ pb[i], like) for i in range(8)]


def _node_param_h0(j_lanes: jnp.ndarray) -> List[U64]:
    """h init for output node j: digest 64, fanout 0, depth 0, leaf 64,
    node_offset j, xof_length 4096, inner 64 (native/blake2.c:194-207)."""
    pb0 = 64 | (64 << 32)  # digest_length 64 | leaf_length 64 (bytes 4-7)
    pb2 = 64 << 8  # node_depth 0 | inner_length 64
    pb1 = _BUFFER << 32  # node_offset j (low 32, lane-varying) | xof_length
    h = []
    for i in range(8):
        base = _IV[i]
        if i == 0:
            base ^= pb0
        if i == 1:
            base ^= pb1
        if i == 2:
            base ^= pb2
        h.append(_const64(base, j_lanes))
    # fold the lane-varying node_offset into word 1's low half
    h[1] = (h[1][0] ^ j_lanes.astype(jnp.uint32), h[1][1])
    return h


def _zero_m(like: jnp.ndarray, count: int = 16) -> List[U64]:
    z = jnp.zeros_like(like)
    return [(z, z)] * count


def expand_stream_words(seed_words: U64, nwords: int, chunk_buffers: int = 256) -> U64:
    """blake2xb counter-mode stream for S seeds, as u64 words.

    ``seed_words``: (S, 8) u64 pair (the 512-bit PRNG seeds).
    Returns (S, nwords) u64 pair — byte-identical (little-endian words) to
    ``Blake2xbPRNG.generate(8 * nwords)`` for each seed.
    """
    S = seed_words[0].shape[0]
    nbuf = -(-nwords // _WORDS_PER_BUFFER)

    # Key-block state: shared by every buffer of a stream (the key block
    # compression consumes only the seed; t = 128, not final).
    like = seed_words[0][:, 0]  # (S,)
    h0 = _root_param_h0(like)
    m_key = [(seed_words[0][:, i], seed_words[1][:, i]) for i in range(8)] + _zero_m(like, 8)
    hk = _compress(h0, m_key, 128, False)  # (S,) lanes

    def buffers_chunk(counters: jnp.ndarray) -> U64:
        """counters: (C,) -> (S, C, 512) words."""
        C = counters.shape[0]
        # Root per (S, C): m[0] = counter, rest zero; t = 136, final.
        likeb = jnp.zeros((S, C), dtype=jnp.uint32)
        hkb = [(w[0][:, None] + likeb, w[1][:, None] + likeb) for w in hk]
        # buffer counters stay far below 2^32 (2^32 buffers = 16 TiB of
        # stream), so the u64 counter's high word is identically zero
        ctr = (counters.astype(jnp.uint32)[None, :] + likeb, likeb)
        m_root = [ctr] + _zero_m(likeb, 15)
        root = _compress(hkb, m_root, 136, True)  # (S, C) lanes, 8 words

        # Output nodes: lanes (S, C, 64); h[1] ^= j; m = root || zeros, t=64.
        j = jnp.arange(64, dtype=jnp.uint32)
        liken = jnp.zeros((S, C, 64), dtype=jnp.uint32)
        hn = _node_param_h0(j[None, None, :] + liken)
        m_node = [(w[0][:, :, None] + liken, w[1][:, :, None] + liken) for w in root]
        m_node = m_node + _zero_m(liken, 8)
        out = _compress(hn, m_node, 64, True)  # (S, C, 64) lanes, 8 words
        # words within a buffer: node-major, 8 words per node
        lo = jnp.stack([w[0] for w in out], axis=-1).reshape(S, C * _WORDS_PER_BUFFER)
        hi = jnp.stack([w[1] for w in out], axis=-1).reshape(S, C * _WORDS_PER_BUFFER)
        return lo, hi

    if nbuf <= chunk_buffers:
        lo, hi = buffers_chunk(jnp.arange(nbuf, dtype=jnp.uint32))
    else:
        nchunk = -(-nbuf // chunk_buffers)
        ctrs = jnp.arange(nchunk * chunk_buffers, dtype=jnp.uint32).reshape(
            nchunk, chunk_buffers
        )

        def step(_, c):
            return None, buffers_chunk(c)

        _, (los, his) = jax.lax.scan(step, None, ctrs)
        # (nchunk, S, C*512) -> (S, nchunk*C*512)
        lo = los.transpose(1, 0, 2).reshape(S, -1)
        hi = his.transpose(1, 0, 2).reshape(S, -1)
    return lo[:, :nwords], hi[:, :nwords]


# ---------------------------------------------------------------------------
# Samplers over the device stream
# ---------------------------------------------------------------------------

def _pow2ceil(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def uniform_reject_prob(q: int) -> float:
    """Exact per-word rejection probability of sample_poly_uniform.

    Words >= max_multiple = 2^64 - (2^64-1 mod q) - 1 are rejected, i.e.
    (2^64-1 mod q) + 2 values.  The reference's prime search descends from
    a power of two, so real moduli sit just below 2^b and this is ~2^-20
    or smaller — rejections are rare events, not a steady stream.
    """
    return float((0xFFFFFFFFFFFFFFFF % q) + 2) / 2.0 ** 64


def uniform_tail_words(n: int, moduli: Sequence[int]) -> Tuple[list, int]:
    """Per-limb rejection-tail window sizes + total tail provision.

    Each window is sized so that exhausting it (binomial tail beyond
    ~12 sigma plus slack) has astronomically small odds; overflow is
    flagged and falls back to the host sampler regardless.
    """
    import math

    tjs = []
    for q in moduli:
        mean = n * uniform_reject_prob(q)
        tjs.append(_pow2ceil(int(2 * mean + 12 * math.sqrt(mean + 1) + 64)))
    return tjs, sum(tjs)


def uniform_from_seed_words(
    seed_words: U64, n: int, moduli: Sequence[int], chunk_buffers: int = 256
) -> Tuple[U64, jnp.ndarray]:
    """``sample_poly_uniform`` on device for S seeds: (S, k, n) in [0, q_i).

    Byte-exact with rlwe.cpp:104-135 / random/sampler.py: bulk-fill k*n
    words, then per-limb sequential rejection redraws from the stream
    continuation.  The serial redraw loop is reformulated exactly: within
    limb j, the m-th rejected position (scan order) receives the m-th word
    of the continuation that is acceptable for limb j, and the number of
    consumed words advances the stream for limb j+1.

    Rejections are rare (see uniform_reject_prob), so the steady-state
    cost is one compare + one reduction per limb; the rank/compaction
    fix-up sits behind a lax.cond and only executes when a word was
    actually rejected.

    Returns (values, overflow) — overflow (S,) flags tail-window
    exhaustion (callers must then redo that stream host-side).
    """
    S = seed_words[0].shape[0]
    k = len(moduli)
    tjs, T = uniform_tail_words(n, moduli)
    nwords = k * n + T
    lo, hi = expand_stream_words(seed_words, nwords, chunk_buffers)
    bulk = (lo[:, : k * n].reshape(S, k, n), hi[:, : k * n].reshape(S, k, n))
    tail = (lo[:, k * n :], hi[:, k * n :])

    max_random = 0xFFFFFFFFFFFFFFFF
    out_lo, out_hi = [], []
    offset = jnp.zeros((S,), dtype=jnp.int32)
    overflow = jnp.zeros((S,), dtype=bool)

    for j, q in enumerate(moduli):
        t_per = tjs[j]
        ar = jnp.arange(t_per, dtype=jnp.int32)
        mm = max_random - (max_random % q) - 1  # values >= mm are rejected
        mm_c = (jnp.uint32(mm & 0xFFFFFFFF), jnp.uint32(mm >> 32))
        wj = (bulk[0][:, j], bulk[1][:, j])  # (S, n)
        bad = U.ge64(wj, mm_c)
        nbad = jnp.sum(bad, axis=1, dtype=jnp.int32)

        def fixup(args, t_per=t_per, ar=ar, mm_c=mm_c):
            wj, bad, nbad, offset = args
            rank = jnp.cumsum(bad, axis=1, dtype=jnp.int32)
            off_c = jnp.minimum(offset, T - t_per)

            def win(t, o):
                return jax.lax.dynamic_slice(t, (o,), (t_per,))

            w = (jax.vmap(win)(tail[0], off_c), jax.vmap(win)(tail[1], off_c))
            good = U.lt64(w, mm_c)
            cg = jnp.cumsum(good, axis=1, dtype=jnp.int32)
            ngood = cg[:, -1]
            # compaction: m[r] = index of the (r+1)-th acceptable tail word,
            # via a permutation scatter
            dest = jnp.where(good, cg - 1, ngood[:, None] + (ar[None, :] - cg))
            m = jnp.zeros((S, t_per), dtype=jnp.int32)
            m = jax.vmap(lambda mm_, d: mm_.at[d].set(ar))(m, dest)
            idx_c = jnp.take_along_axis(
                m, jnp.minimum(rank - 1, t_per - 1).clip(0), axis=1
            )
            repl = (
                jnp.take_along_axis(w[0], idx_c, axis=1),
                jnp.take_along_axis(w[1], idx_c, axis=1),
            )
            vals = U.select64(bad, repl, wj)
            last_idx = jnp.take_along_axis(
                m, jnp.minimum(nbad - 1, t_per - 1).clip(0)[:, None], axis=1
            )[:, 0]
            consumed = jnp.where(nbad > 0, jnp.minimum(last_idx, t_per - 1) + 1, 0)
            over = (nbad > ngood) | ((offset + consumed > T - t_per) & (nbad > 0)) \
                | (offset > T - t_per)
            return vals, consumed, over

        def passthrough(args):
            wj, bad, nbad, offset = args
            z = jnp.zeros((S,), dtype=jnp.int32)
            return wj, z, jnp.zeros((S,), dtype=bool)

        vals, consumed, over = jax.lax.cond(
            jnp.any(nbad > 0), fixup, passthrough, (wj, bad, nbad, offset)
        )
        # reduce mod q (np.mod in the host sampler)
        rhi = (1 << 128) // q >> 64
        rhi_c = (jnp.uint32(rhi & 0xFFFFFFFF), jnp.uint32(rhi >> 32))
        q_c = (jnp.uint32(q & 0xFFFFFFFF), jnp.uint32(q >> 32))
        vals = U.barrett_reduce_64(vals, q_c, rhi_c)
        out_lo.append(vals[0])
        out_hi.append(vals[1])
        overflow = overflow | over
        offset = offset + consumed

    out = (jnp.stack(out_lo, axis=1), jnp.stack(out_hi, axis=1))  # (S, k, n)
    return out, overflow


def words_to_bytes(words: U64) -> jnp.ndarray:
    """(..., W) u64 words -> (..., 8*W) uint32 byte values (little-endian)."""
    lo, hi = words
    parts = [(lo >> (8 * i)) & jnp.uint32(0xFF) for i in range(4)]
    parts += [(hi >> (8 * i)) & jnp.uint32(0xFF) for i in range(4)]
    return jnp.stack(parts, axis=-1).reshape(*lo.shape[:-1], -1)


def _popcount8(v: jnp.ndarray) -> jnp.ndarray:
    """Popcount of byte values held in uint32 lanes."""
    v = v - ((v >> 1) & jnp.uint32(0x55))
    v = (v & jnp.uint32(0x33)) + ((v >> 2) & jnp.uint32(0x33))
    return (v + (v >> 4)) & jnp.uint32(0x0F)


def cbd_noise_from_words(words: U64, n: int, skip_bytes: int = 0) -> jnp.ndarray:
    """``sample_poly_cbd`` on device: (..., W) stream words -> (..., n) int32.

    Byte-exact with rlwe.cpp:66-103: 6 bytes per coefficient starting at
    ``skip_bytes`` into the stream, top 3 bits of bytes 2 and 5 masked,
    noise = hamming(first 3 bytes) - hamming(last 3 bytes).
    """
    b = words_to_bytes(words)[..., skip_bytes : skip_bytes + 6 * n]
    b = b.reshape(*b.shape[:-1], n, 6)
    mask = jnp.array([0xFF, 0xFF, 0x1F, 0xFF, 0xFF, 0x1F], dtype=jnp.uint32)
    b = b & mask
    pc = _popcount8(b)
    pos = pc[..., 0] + pc[..., 1] + pc[..., 2]
    neg = pc[..., 3] + pc[..., 4] + pc[..., 5]
    return pos.astype(jnp.int32) - neg.astype(jnp.int32)


def lift_signed(vals: jnp.ndarray, moduli: Sequence[int]) -> U64:
    """(..., n) signed int32 -> (..., k, n) u64 with negatives as q_i - |v|.

    Device counterpart of random/sampler.py:_replicate_signed.
    """
    from .rns import _c

    neg = vals < 0
    mag = jnp.abs(vals).astype(jnp.uint32)
    k = len(moduli)
    q = _c(list(moduli))  # (k, 1)
    magk = (mag[..., None, :], jnp.zeros_like(mag)[..., None, :])
    qb = (q[0][..., :, :], q[1][..., :, :])
    lifted = U.sub64(qb, magk)
    pos = (magk[0], magk[1])
    negk = neg[..., None, :]
    zero = vals[..., None, :] == 0
    out = U.select64(negk & ~zero, lifted, pos)
    return out
