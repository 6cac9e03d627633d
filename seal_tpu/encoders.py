"""Encoders: BatchEncoder here; CKKSEncoder in ckks_encoder.py.

BatchEncoder counterpart of ``batchencoder.{h,cpp}``: N slots viewed as a
2 x (N/2) matrix over Z_t, values placed at bit-reversed positions of the
g=3 orbit index map, then an inverse negacyclic NTT mod t (so that slot-wise
products correspond to poly products).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .context import SealContext
from .data import Plaintext
from .params import SchemeType, PARMS_ID_ZERO
from .ops import ntt as NTT
from .ops import u64 as U


class BatchEncoder:
    def __init__(self, context: SealContext):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        cd = context.first_context_data()
        if cd.parms.scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        if not cd.qualifiers.using_batching:
            raise ValueError("encryption parameters are not valid for batching")
        self.context = context
        self.slots = cd.parms.poly_modulus_degree

        # matrix_reps_index_map (batchencoder.cpp:64-88)
        n = self.slots
        logn = n.bit_length() - 1
        row_size = n >> 1
        m = n << 1
        index_map = np.zeros(n, dtype=np.int64)
        pos = 1
        from . import numth

        for i in range(row_size):
            index1 = (pos - 1) >> 1
            index2 = (m - pos - 1) >> 1
            index_map[i] = numth.reverse_bits(index1, logn)
            index_map[row_size | i] = numth.reverse_bits(index2, logn)
            pos = (pos * 3) & (m - 1)
        self.index_map = index_map

    def encode(self, values: Sequence[int]) -> Plaintext:
        """uint64 slot values -> coefficient plaintext (iNTT mod t)."""
        cd = self.context.first_context_data()
        t = cd.parms.plain_modulus.value
        if not isinstance(values, (np.ndarray, list, tuple)):
            values = list(values)
        arr = np.asarray(values, dtype=np.uint64)
        if arr.ndim != 1:
            raise ValueError("values_matrix must be one-dimensional")
        if arr.size > self.slots:
            raise ValueError("values_matrix size is too large")
        if arr.size and int(arr.max()) >= t:
            raise ValueError("input value is larger than plain_modulus")
        buf = np.zeros(self.slots, dtype=np.uint64)
        buf[self.index_map[: arr.size]] = arr
        # host data in, host data out: the mod-t transform runs in the
        # native C NTT (native/ntt_mod.c) — a device dispatch here would be
        # pure host<->device round-trip latency (batchencoder.cpp:110-148)
        from . import native
        from .ntt_tables import host_c_ntt_tables

        ct = host_c_ntt_tables(cd.log_n, cd.parms.plain_modulus)
        native.ntt_mod_inv(
            buf, ct["q"], ct["inv_op"], ct["inv_qt"],
            ct["invn_op"], ct["invn_qt"], ct["last_op"], ct["last_qt"],
        )
        return Plaintext.from_coeffs(buf)

    def encode_int64(self, values: Sequence[int]) -> Plaintext:
        """Signed variant: negatives wrap mod t (batchencoder.cpp:150-194)."""
        cd = self.context.first_context_data()
        t = cd.parms.plain_modulus.value
        arr = np.asarray(values, dtype=np.int64)
        if arr.size and (int(arr.min()) < -(t >> 1) or int(arr.max()) > (t - 1) >> 1):
            raise ValueError("input value is out of range")
        return self.encode(np.where(arr < 0, arr + t, arr).astype(np.uint64))

    def decode(self, plain: Plaintext) -> np.ndarray:
        if plain.is_ntt_form:
            raise ValueError("plain cannot be in NTT form")
        cd = self.context.first_context_data()
        buf = np.zeros(self.slots, dtype=np.uint64)
        data = plain.coeff_data[: self.slots]
        buf[: len(data)] = data
        from . import native
        from .ntt_tables import host_c_ntt_tables

        ct = host_c_ntt_tables(cd.log_n, cd.parms.plain_modulus)
        native.ntt_mod_fwd(buf, ct["q"], ct["fwd_op"], ct["fwd_qt"])
        return buf[self.index_map]

    def decode_int64(self, plain: Plaintext) -> np.ndarray:
        t = self.context.first_context_data().parms.plain_modulus.value
        vals = np.asarray(self.decode(plain), dtype=np.uint64)
        return np.where(vals > np.uint64(t >> 1), vals.astype(np.int64) - t, vals.astype(np.int64))
