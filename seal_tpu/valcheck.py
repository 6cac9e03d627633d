"""Validity checks for data objects against a context.

Counterpart of ``valcheck.{h,cpp}``: layered checks — metadata (parms_id in
context, consistent sizes/levels/NTT flags), buffer size, and data bounds
(coefficients below their moduli).  Evaluator entry points run metadata
checks host-side before dispatch; data checks are optional (they require a
device->host read) and used by untrusted-load paths.
"""

from __future__ import annotations

import numpy as np

from .params import PARMS_ID_ZERO, SchemeType
from .modulus import CIPHERTEXT_SIZE_MAX, CIPHERTEXT_SIZE_MIN


def is_metadata_valid_ct(context, parms_id, size, degree, k, allow_key_level=False) -> bool:
    """cf. ``is_metadata_valid_for(Ciphertext)`` (valcheck.cpp)."""
    cd = context.get_context_data(parms_id)
    if cd is None:
        return False
    if not allow_key_level and parms_id == context.key_parms_id and context.using_keyswitching:
        return False
    parms = cd.parms
    if degree != parms.poly_modulus_degree:
        return False
    if k != len(parms.coeff_modulus):
        return False
    if size < CIPHERTEXT_SIZE_MIN or size > CIPHERTEXT_SIZE_MAX:
        return False
    return True


def is_metadata_valid_for(obj, context, allow_pure_key_levels: bool = False) -> bool:
    from .data import Ciphertext, Plaintext, PublicKey, SecretKey

    if isinstance(obj, Ciphertext):
        if obj.data is None:
            return False
        return is_metadata_valid_ct(
            context, obj.parms_id, obj.size, obj.poly_modulus_degree,
            obj.coeff_modulus_size, allow_pure_key_levels,
        )
    if isinstance(obj, Plaintext):
        if obj.is_ntt_form:
            cd = context.get_context_data(obj.parms_id)
            if cd is None:
                return False
            k = len(cd.parms.coeff_modulus)
            n = cd.parms.poly_modulus_degree
            return obj.rns_data is not None and obj.rns_data[0].shape == (k, n)
        return len(obj.coeff_data) <= context.first_context_data().parms.poly_modulus_degree
    if isinstance(obj, SecretKey):
        return obj.parms_id == context.key_parms_id and obj.data is not None
    if isinstance(obj, PublicKey):
        return (
            obj.data.parms_id == context.key_parms_id
            and obj.data.is_ntt_form
            and is_metadata_valid_ct(
                context, obj.data.parms_id, obj.data.size, obj.data.poly_modulus_degree,
                obj.data.coeff_modulus_size, allow_key_level=True,
            )
        )
    return False


def is_data_valid_for(obj, context) -> bool:
    """Coefficient bounds check (device->host read; untrusted-load path)."""
    from .data import Ciphertext, Plaintext
    from .ops import u64 as U

    if isinstance(obj, Ciphertext):
        cd = context.get_context_data(obj.parms_id)
        if cd is None:
            return False
        data = obj.to_np()  # (size, k, n)
        for i, q in enumerate(cd.coeff_modulus_values):
            if (data[:, i, :] >= q).any():
                return False
        return True
    if isinstance(obj, Plaintext):
        if obj.is_ntt_form:
            cd = context.get_context_data(obj.parms_id)
            if cd is None:
                return False
            data = U.to_np_u64(obj.rns_data)
            for i, q in enumerate(cd.coeff_modulus_values):
                if (data[i] >= q).any():
                    return False
            return True
        t = context.first_context_data().parms.plain_modulus.value
        if t == 0:
            return True
        return not (np.asarray(obj.coeff_data) >= t).any()
    return True


def is_valid_for(obj, context) -> bool:
    return is_metadata_valid_for(obj, context) and is_data_valid_for(obj, context)
