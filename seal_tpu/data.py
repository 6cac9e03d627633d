"""Data objects: Plaintext, Ciphertext, keys.

Counterparts of ``plaintext.h`` / ``ciphertext.h`` / ``secretkey.h`` /
``publickey.h`` / ``kswitchkeys.h``.  TPU-first data model (SURVEY.md §7):
a ciphertext is a pair of uint32 device arrays of shape (size, k, n) (lo/hi
words of u64 coefficients, layout [poly][rns_limb][coeff] like
``ciphertext.h:728-742``) plus host metadata (parms_id, ntt flag, scale,
BGV correction factor).  Key-switching keys are stored *stacked* over the
decomposition axis — (num_decomp, 2, k_key, n) — which is the natural layout
for the TPU key-switch contraction, instead of the reference's
vector<vector<PublicKey>>.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .params import ParmsId, PARMS_ID_ZERO
from .ops import u64 as U


class Plaintext:
    """Either a mod-t coefficient polynomial (parms_id zero, host numpy) or
    an RNS/NTT polynomial tied to a context level (device arrays).

    cf. ``plaintext.h:796-802``.
    """

    def __init__(self, coeff_count: int = 0):
        self.parms_id: ParmsId = PARMS_ID_ZERO
        self.scale: float = 1.0
        self.coeff_data: np.ndarray = np.zeros(coeff_count, dtype=np.uint64)
        self.rns_data: Optional[U.U64] = None  # (k, n) device pair when in NTT form

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_coeffs(cls, coeffs) -> "Plaintext":
        p = cls()
        p.coeff_data = np.asarray(coeffs, dtype=np.uint64).copy()
        return p

    @classmethod
    def from_hex(cls, hex_poly: str) -> "Plaintext":
        """Parse SEAL's hex-polynomial format, e.g. '3x^2 + 1x^1 + 2'."""
        terms = {}
        s = hex_poly.replace(" ", "")
        if not s:
            return cls(0)
        for term in s.split("+"):
            if "x^" in term:
                c, e = term.split("x^")
                coeff = int(c, 16) if c else 1
                exp = int(e)
            elif term.endswith("x"):
                coeff = int(term[:-1], 16) if term[:-1] else 1
                exp = 1
            else:
                coeff = int(term, 16)
                exp = 0
            terms[exp] = terms.get(exp, 0) + coeff
        degree = max(terms) if terms else 0
        data = np.zeros(degree + 1, dtype=np.uint64)
        for e, c in terms.items():
            data[e] = c
        return cls.from_coeffs(data)

    @property
    def is_ntt_form(self) -> bool:
        return self.parms_id != PARMS_ID_ZERO

    @property
    def coeff_count(self) -> int:
        return len(self.coeff_data) if not self.is_ntt_form else int(self.rns_data[0].size)

    def significant_coeff_count(self) -> int:
        nz = np.nonzero(self.coeff_data)[0]
        return int(nz[-1]) + 1 if len(nz) else 0

    def to_string(self) -> str:
        """SEAL hex-polynomial format (plaintext.cpp to_string)."""
        if self.is_ntt_form:
            raise ValueError("cannot convert NTT-form plaintext to string")
        nz = np.nonzero(self.coeff_data)[0]
        if len(nz) == 0:
            return "0"
        parts = []
        for e in reversed(nz):
            c = format(int(self.coeff_data[e]), "X")
            if e == 0:
                parts.append(c)
            elif e == 1:
                parts.append(f"{c}x^1")
            else:
                parts.append(f"{c}x^{e}")
        return " + ".join(parts)

    def __eq__(self, other):
        if not isinstance(other, Plaintext):
            return NotImplemented
        if self.is_ntt_form != other.is_ntt_form:
            return False
        if self.is_ntt_form:
            return self.parms_id == other.parms_id and bool(
                (U.to_np_u64(self.rns_data) == U.to_np_u64(other.rns_data)).all()
            )
        a, b = self.coeff_data, other.coeff_data
        asig, bsig = self.significant_coeff_count(), other.significant_coeff_count()
        return asig == bsig and (a[:asig] == b[:bsig]).all()

    def copy(self) -> "Plaintext":
        p = Plaintext()
        p.parms_id = self.parms_id
        p.scale = self.scale
        p.coeff_data = self.coeff_data.copy()
        p.rns_data = self.rns_data
        return p


class Ciphertext:
    """RNS ciphertext: device u64 pair of shape (size, k, n) + metadata.

    cf. ``ciphertext.h:728-742``.
    """

    def __init__(
        self,
        data: Optional[U.U64] = None,
        parms_id: ParmsId = PARMS_ID_ZERO,
        is_ntt_form: bool = False,
        scale: float = 1.0,
        correction_factor: int = 1,
    ):
        self.data = data
        self.parms_id = parms_id
        self.is_ntt_form = is_ntt_form
        self.scale = scale
        self.correction_factor = correction_factor
        # seed info for seeded (compressed) ciphertexts
        self.seed_info = None

    @property
    def size(self) -> int:
        return 0 if self.data is None else int(self.data[0].shape[0])

    @property
    def coeff_modulus_size(self) -> int:
        return 0 if self.data is None else int(self.data[0].shape[1])

    @property
    def poly_modulus_degree(self) -> int:
        return 0 if self.data is None else int(self.data[0].shape[2])

    def poly(self, j: int) -> U.U64:
        return self.data[0][j], self.data[1][j]

    def to_np(self) -> np.ndarray:
        return U.to_np_u64(self.data)

    def copy(self) -> "Ciphertext":
        c = Ciphertext(self.data, self.parms_id, self.is_ntt_form, self.scale, self.correction_factor)
        c.seed_info = self.seed_info
        return c

    def is_transparent(self) -> bool:
        """True if the ciphertext trivially decrypts (all polys beyond c0
        are zero) — cf. ``ciphertext.h:451``."""
        if self.size < 2:
            return True
        lo, hi = self.data
        if isinstance(lo, np.ndarray):
            return not (lo[1:] | hi[1:]).any()
        # device arrays: reduce on device, fetch one scalar — never pull
        # the ciphertext tail through the host boundary
        import jax.numpy as jnp

        return not bool(jnp.any((lo[1:] | hi[1:]) != 0))


class SecretKey:
    """NTT-form ternary secret at the key level (``secretkey.h:297``)."""

    def __init__(self, data: U.U64 = None, parms_id: ParmsId = PARMS_ID_ZERO):
        self.data = data  # (k_key, n) NTT form
        self.parms_id = parms_id

    def zeroize(self):
        """Best-effort secret erasure (the reference's clear_on_destruction
        pool semantic, memorymanager.h).  Drops the device buffers and
        replaces them with zeros; device memory is freed by the runtime.
        Host-side copies made by the caller are the caller's responsibility.
        """
        if self.data is not None:
            import jax.numpy as jnp

            shape = self.data[0].shape
            self.data = (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))
        self.parms_id = PARMS_ID_ZERO


class PublicKey:
    """Encryption of zero in NTT form at the key level (``publickey.h:268``)."""

    def __init__(self, ciphertext: Optional[Ciphertext] = None):
        self.data = ciphertext if ciphertext is not None else Ciphertext()

    @property
    def parms_id(self) -> ParmsId:
        return self.data.parms_id


class KSwitchKeys:
    """Key-switching keys, stacked for the TPU contraction.

    ``keys[index]`` is None or a dict with:
      'c0', 'c1': u64 pairs of shape (num_decomp, k_key, n) — the two
      components of each decomposition-limb encryption, NTT form.
    cf. ``kswitchkeys.h:340`` (vector<vector<PublicKey>>).
    """

    def __init__(self):
        self.parms_id: ParmsId = PARMS_ID_ZERO
        self.keys: List[Optional[dict]] = []

    def size(self) -> int:
        return sum(1 for k in self.keys if k is not None)


class RelinKeys(KSwitchKeys):
    """Relinearization keys: index = key_power - 2 (``relinkeys.h:58``)."""

    @staticmethod
    def get_index(key_power: int) -> int:
        if key_power < 2:
            raise ValueError("key_power cannot be less than 2")
        return key_power - 2

    def has_key(self, key_power: int) -> bool:
        i = self.get_index(key_power)
        return i < len(self.keys) and self.keys[i] is not None

    def key(self, key_power: int) -> dict:
        return self.keys[self.get_index(key_power)]


class GaloisKeys(KSwitchKeys):
    """Galois keys: index = (galois_elt - 1) / 2 (``galoiskeys.h:48``)."""

    @staticmethod
    def get_index(galois_elt: int) -> int:
        if not (galois_elt & 1):
            raise ValueError("galois_elt is not valid")
        return (galois_elt - 1) >> 1

    def has_key(self, galois_elt: int) -> bool:
        i = self.get_index(galois_elt)
        return i < len(self.keys) and self.keys[i] is not None

    def key(self, galois_elt: int) -> dict:
        return self.keys[self.get_index(galois_elt)]
