"""SEALContext: parameter validation + per-level precompute + modulus chain.

Counterpart of ``native/src/seal/context.{h,cpp}``.  A context is an
immutable bundle of per-level ``ContextData`` linked into the modulus
switching chain (drop last prime per level, ``context.cpp:462-563``).  Each
level carries exact host constants (Python ints) and lazily-built device
constant bundles (uint32 arrays) for the jnp/Pallas kernels — the TPU analog
of the reference's precomputed NTTTables/RNSTool/GaloisTool.

Validation reproduces ``SEALContext::validate`` (context.cpp:142-460): same
qualifier flags, same error taxonomy, same HE-standard security gate.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import numth
from .modulus import (
    COEFF_MOD_COUNT_MAX,
    COEFF_MOD_COUNT_MIN,
    CoeffModulus,
    Modulus,
    POLY_MOD_DEGREE_MAX,
    POLY_MOD_DEGREE_MIN,
    PLAIN_MOD_BIT_COUNT_MAX,
    PLAIN_MOD_BIT_COUNT_MIN,
    MOD_BIT_COUNT_MAX,
    USER_MOD_BIT_COUNT_MAX,
    MOD_BIT_COUNT_MIN,
    SecurityLevel,
)
from .ntt_tables import HostNTTTables, LimbTables, build_limb_tables
from .params import EncryptionParameters, ParmsId, PARMS_ID_ZERO, SchemeType
from .rns_host import HostRNSBase, HostRNSTool, shoup_pair, split_u64_array


class ErrorType(enum.Enum):
    """Parameter validation outcomes (cf. ``error_type``, context.h:34-120)."""

    NONE = "none"
    SUCCESS = "success"
    INVALID_SCHEME = "invalid_scheme"
    INVALID_COEFF_MODULUS_SIZE = "invalid_coeff_modulus_size"
    INVALID_COEFF_MODULUS_BIT_COUNT = "invalid_coeff_modulus_bit_count"
    INVALID_COEFF_MODULUS_NO_NTT = "invalid_coeff_modulus_no_ntt"
    INVALID_COEFF_MODULUS_NON_PRIME = "invalid_coeff_modulus_non_prime"
    INVALID_POLY_MODULUS_DEGREE = "invalid_poly_modulus_degree"
    INVALID_POLY_MODULUS_DEGREE_NON_POWER_OF_TWO = "invalid_poly_modulus_degree_non_power_of_two"
    INVALID_PARAMETERS_TOO_LARGE = "invalid_parameters_too_large"
    INVALID_PARAMETERS_INSECURE = "invalid_parameters_insecure"
    FAILED_CREATING_RNS_BASE = "failed_creating_rns_base"
    INVALID_PLAIN_MODULUS_BIT_COUNT = "invalid_plain_modulus_bit_count"
    INVALID_PLAIN_MODULUS_COPRIMALITY = "invalid_plain_modulus_coprimality"
    INVALID_PLAIN_MODULUS_TOO_LARGE = "invalid_plain_modulus_too_large"
    INVALID_PLAIN_MODULUS_NONZERO = "invalid_plain_modulus_nonzero"
    FAILED_CREATING_RNS_TOOL = "failed_creating_rns_tool"


@dataclass
class EncryptionParameterQualifiers:
    """cf. ``EncryptionParameterQualifiers`` (context.h:28-214)."""

    parameter_error: ErrorType = ErrorType.NONE
    using_fft: bool = False
    using_ntt: bool = False
    using_batching: bool = False
    using_fast_plain_lift: bool = False
    using_descending_modulus_chain: bool = False
    sec_level: SecurityLevel = SecurityLevel.NONE

    @property
    def parameters_set(self) -> bool:
        return self.parameter_error == ErrorType.SUCCESS

    @property
    def parameter_error_message(self) -> str:
        return self.parameter_error.value


from .ntt_tables import cached_host_ntt_tables as cached_ntt_tables


def jit_cached(holder, key: tuple, builder):
    """Fetch or create a jit-compiled closure in the holder's op cache.

    ``holder`` is any object with a ``_jit_cache`` dict (SealContext or
    ContextData).

    All device math in the library goes through here — eager dispatch of the
    u64-lane kernels is ~1000x slower than compiled execution, so every hot
    path (evaluator ops, keygen, encrypt/decrypt, encoders) compiles once per
    (op, level, shape) key and reuses the executable.
    """
    cache = holder._jit_cache
    fn = cache.get(key)
    if fn is None:
        import jax

        fn = jax.jit(builder)
        cache[key] = fn
    return fn


class GaloisTool:
    """Automorphism helper with cached permutation tables (``util/galois.cpp``)."""

    GENERATOR = 3

    def __init__(self, log_n: int):
        self.log_n = log_n
        self.n = 1 << log_n
        self._ntt_tables: Dict[int, np.ndarray] = {}
        self._coeff_tables: Dict[int, tuple] = {}
        self._ntt_structured: Dict[int, tuple] = {}

    def get_elt_from_step(self, step: int) -> int:
        from .ops.poly import get_elt_from_step

        return get_elt_from_step(step, self.n)

    def get_elts_from_steps(self, steps: Sequence[int]) -> List[int]:
        return [self.get_elt_from_step(s) for s in steps]

    def get_elts_all(self) -> List[int]:
        from .ops.poly import get_elts_all

        return get_elts_all(self.n)

    @staticmethod
    def get_index_from_elt(galois_elt: int) -> int:
        return (galois_elt - 1) >> 1

    def ntt_table(self, galois_elt: int) -> np.ndarray:
        if galois_elt not in self._ntt_tables:
            from .ops.poly import make_galois_table_ntt

            self._ntt_tables[galois_elt] = make_galois_table_ntt(self.n, galois_elt)
        return self._ntt_tables[galois_elt]

    def ntt_table_structured(self, galois_elt: int):
        """(row_map, col_onehot) factoring of the NTT permutation for the
        MXU path (ops/poly.py:galois_ntt_structure), or None for tiny n."""
        if galois_elt not in self._ntt_structured:
            from .ops.poly import galois_ntt_structure

            self._ntt_structured[galois_elt] = galois_ntt_structure(
                self.ntt_table(galois_elt)
            )
        return self._ntt_structured[galois_elt]

    def coeff_table(self, galois_elt: int) -> tuple:
        if galois_elt not in self._coeff_tables:
            from .ops.poly import make_galois_table_coeff

            self._coeff_tables[galois_elt] = make_galois_table_coeff(self.n, galois_elt)
        return self._coeff_tables[galois_elt]


class ContextData:
    """Per-level immutable precompute bundle (cf. ``SEALContext::ContextData``)."""

    def __init__(self, parms: EncryptionParameters):
        self.parms = parms
        self.qualifiers = EncryptionParameterQualifiers()
        self.prev_context_data: Optional["ContextData"] = None
        self.next_context_data: Optional["ContextData"] = None
        self.chain_index = 0

        self.total_coeff_modulus: int = 1
        self.base_q: Optional[HostRNSBase] = None
        self.ntt_tables: List[HostNTTTables] = []
        self.plain_ntt_tables: Optional[HostNTTTables] = None
        self.rns_tool: Optional[HostRNSTool] = None
        self.galois_tool: Optional[GaloisTool] = None

        # BFV/BGV constants
        self.coeff_div_plain_modulus: List[int] = []      # Delta = floor(q/t) in RNS
        self.plain_upper_half_threshold: int = 0
        self.plain_upper_half_increment: List[int] = []   # per-limb or multiprecision RNS
        self.upper_half_increment: List[int] = []         # (q mod t) in RNS
        self.coeff_modulus_mod_plain_modulus: int = 0     # q mod t
        # CKKS constants
        self.upper_half_threshold: int = 0                # (q+1)/2 multiprecision

        self._device_cache: dict = {}
        self._jit_cache: dict = {}

    # -- accessors ---------------------------------------------------------
    @property
    def parms_id(self) -> ParmsId:
        return self.parms.parms_id

    @property
    def total_coeff_modulus_bit_count(self) -> int:
        return self.total_coeff_modulus.bit_length()

    @property
    def coeff_modulus_values(self) -> List[int]:
        return [m.value for m in self.parms.coeff_modulus]

    @property
    def log_n(self) -> int:
        return self.parms.poly_modulus_degree.bit_length() - 1

    # -- device bundles (lazy) --------------------------------------------
    def limb_tables(self) -> LimbTables:
        """NTT + modulus constants for base q at this level."""
        if "limb" not in self._device_cache:
            self._device_cache["limb"] = build_limb_tables(
                self.log_n, self.parms.coeff_modulus, self.ntt_tables
            )
        return self._device_cache["limb"]

    def plain_limb_tables(self) -> LimbTables:
        if "plain_limb" not in self._device_cache:
            self._device_cache["plain_limb"] = build_limb_tables(
                self.log_n, [self.parms.plain_modulus], [self.plain_ntt_tables]
            )
        return self._device_cache["plain_limb"]

    def bsk_limb_tables(self) -> LimbTables:
        if "bsk_limb" not in self._device_cache:
            self._device_cache["bsk_limb"] = build_limb_tables(
                self.log_n, self.rns_tool.base_Bsk.moduli, self.rns_tool.base_Bsk_ntt
            )
        return self._device_cache["bsk_limb"]

    def tscaled_limb_tables(self, base: str) -> LimbTables:
        """Inverse-NTT tables with x t folded into the fused 1/n stage.

        The BEHZ pipeline multiplies every iNTT output by the plain
        modulus t (evaluator.cpp:549); folding t into the inverse scaling
        constants makes that multiply free.  ``base`` is 'q' or 'bsk'.
        """
        key = f"tscaled_{base}"
        if key not in self._device_cache:
            t = self.parms.plain_modulus.value
            if base == "q":
                mods, host = self.parms.coeff_modulus, self.ntt_tables
            else:
                mods, host = self.rns_tool.base_Bsk.moduli, self.rns_tool.base_Bsk_ntt
            self._device_cache[key] = build_limb_tables(
                self.log_n, mods, host, inv_scale=[t] * len(mods)
            )
        return self._device_cache[key]

    def jit_cache(self) -> dict:
        return self._jit_cache


class SealContext:
    """Validated parameter chain (cf. ``SEALContext``, context.cpp:495-563)."""

    def __init__(
        self,
        parms: EncryptionParameters,
        expand_mod_chain: bool = True,
        sec_level: SecurityLevel = SecurityLevel.TC128,
    ):
        self.sec_level = sec_level
        parms = parms.clone()
        self._context_data_map: Dict[ParmsId, ContextData] = {}
        # Cache of jit-compiled op closures, keyed by (op, parms_id, shapes...)
        self._jit_cache: Dict[tuple, object] = {}

        key_cd = self._validate(parms)
        self._context_data_map[parms.parms_id] = key_cd
        self.key_parms_id = parms.parms_id

        if not key_cd.qualifiers.parameters_set or len(parms.coeff_modulus) == 1:
            self.first_parms_id = self.key_parms_id
        else:
            next_id = self._create_next_context_data(self.key_parms_id)
            self.first_parms_id = self.key_parms_id if next_id == PARMS_ID_ZERO else next_id

        self.last_parms_id = self.first_parms_id
        self.using_keyswitching = self.first_parms_id != self.key_parms_id

        if expand_mod_chain and self._context_data_map[self.first_parms_id].qualifiers.parameters_set:
            prev = self.first_parms_id
            while len(self._context_data_map[prev].parms.coeff_modulus) > 1:
                next_id = self._create_next_context_data(prev)
                if next_id == PARMS_ID_ZERO:
                    break
                prev = next_id
                self.last_parms_id = next_id

        # chain indices, counting down from key level
        count = len(self._context_data_map)
        cd: Optional[ContextData] = self._context_data_map[self.key_parms_id]
        while cd is not None:
            count -= 1
            cd.chain_index = count
            cd = cd.next_context_data

    # -- chain assembly ----------------------------------------------------
    def _create_next_context_data(self, prev_id: ParmsId) -> ParmsId:
        prev = self._context_data_map[prev_id]
        next_parms = prev.parms.clone()
        next_parms.set_coeff_modulus(next_parms.coeff_modulus[:-1])
        cd = self._validate(next_parms)
        if not cd.qualifiers.parameters_set:
            return PARMS_ID_ZERO
        self._context_data_map[next_parms.parms_id] = cd
        prev.next_context_data = cd
        cd.prev_context_data = prev
        return next_parms.parms_id

    # -- lookups -----------------------------------------------------------
    def get_context_data(self, parms_id: ParmsId) -> Optional[ContextData]:
        return self._context_data_map.get(tuple(parms_id))

    def key_context_data(self) -> ContextData:
        return self._context_data_map[self.key_parms_id]

    def first_context_data(self) -> ContextData:
        return self._context_data_map[self.first_parms_id]

    def last_context_data(self) -> ContextData:
        return self._context_data_map[self.last_parms_id]

    @property
    def parameters_set(self) -> bool:
        return self.first_context_data().qualifiers.parameters_set

    def parameter_error_name(self) -> str:
        return self.key_context_data().qualifiers.parameter_error.name

    def parameter_error_message(self) -> str:
        return self.key_context_data().qualifiers.parameter_error_message

    # -- validation (context.cpp:142-460) ---------------------------------
    def _validate(self, parms: EncryptionParameters) -> ContextData:
        cd = ContextData(parms)
        q = cd.qualifiers
        q.parameter_error = ErrorType.SUCCESS

        if parms.scheme == SchemeType.NONE:
            q.parameter_error = ErrorType.INVALID_SCHEME
            return cd

        coeff_modulus = parms.coeff_modulus
        plain_modulus = parms.plain_modulus

        if not (COEFF_MOD_COUNT_MIN <= len(coeff_modulus) <= COEFF_MOD_COUNT_MAX):
            q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_SIZE
            return cd

        for m in coeff_modulus:
            # user coeff moduli are capped at 60 bits (context.cpp:168,
            # SEAL_USER_MOD_BIT_COUNT_MAX); 61-bit values are internal-only
            if m.value >> USER_MOD_BIT_COUNT_MAX or not (m.value >> (MOD_BIT_COUNT_MIN - 1)):
                q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_BIT_COUNT
                return cd
            if not m.is_prime:
                q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_NON_PRIME
                return cd

        cd.total_coeff_modulus = 1
        for m in coeff_modulus:
            cd.total_coeff_modulus *= m.value

        n = parms.poly_modulus_degree
        if not (POLY_MOD_DEGREE_MIN <= n <= POLY_MOD_DEGREE_MAX):
            q.parameter_error = ErrorType.INVALID_POLY_MODULUS_DEGREE
            return cd
        log_n = n.bit_length() - 1
        if (1 << log_n) != n:
            q.parameter_error = ErrorType.INVALID_POLY_MODULUS_DEGREE_NON_POWER_OF_TWO
            return cd

        q.using_fft = True
        q.sec_level = self.sec_level
        if cd.total_coeff_modulus_bit_count > CoeffModulus.max_bit_count(n, self.sec_level):
            q.sec_level = SecurityLevel.NONE
            if self.sec_level != SecurityLevel.NONE:
                q.parameter_error = ErrorType.INVALID_PARAMETERS_INSECURE
                return cd

        try:
            cd.base_q = HostRNSBase(coeff_modulus)
        except ValueError:
            q.parameter_error = ErrorType.FAILED_CREATING_RNS_BASE
            return cd

        q.using_ntt = True
        try:
            cd.ntt_tables = [cached_ntt_tables(log_n, m) for m in coeff_modulus]
        except (ValueError, RuntimeError):
            q.using_ntt = False
            q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_NO_NTT
            return cd

        if parms.scheme in (SchemeType.BFV, SchemeType.BGV):
            t = plain_modulus.value
            if t >> PLAIN_MOD_BIT_COUNT_MAX or not (t >> (PLAIN_MOD_BIT_COUNT_MIN - 1)):
                q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_BIT_COUNT
                return cd
            for m in coeff_modulus:
                if numth.gcd(m.value, t) != 1:
                    q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_COPRIMALITY
                    return cd
            if t >= cd.total_coeff_modulus:
                q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_TOO_LARGE
                return cd

            q.using_batching = True
            try:
                cd.plain_ntt_tables = cached_ntt_tables(log_n, plain_modulus)
            except (ValueError, RuntimeError):
                q.using_batching = False

            q.using_fast_plain_lift = all(m.value > t for m in coeff_modulus)

            # Delta = floor(q/t) and remainder (context.cpp:332-376)
            delta, rem = divmod(cd.total_coeff_modulus, t)
            cd.coeff_div_plain_modulus = cd.base_q.decompose(delta)
            cd.upper_half_increment = cd.base_q.decompose(rem)
            cd.coeff_modulus_mod_plain_modulus = rem
            cd.plain_upper_half_threshold = (t + 1) >> 1
            if q.using_fast_plain_lift:
                cd.plain_upper_half_increment = [m.value - t for m in coeff_modulus]
            else:
                cd.plain_upper_half_increment = cd.base_q.decompose(cd.total_coeff_modulus - t)
        elif parms.scheme == SchemeType.CKKS:
            if not plain_modulus.is_zero:
                q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_NONZERO
                return cd
            q.using_batching = True
            q.using_fast_plain_lift = False
            cd.plain_upper_half_threshold = 1 << 63
            # plain_upper_half_increment_i = (-2^64) mod q_i (context.cpp:395-404)
            cd.plain_upper_half_increment = [
                ((1 << 63) % m.value) * (m.value - 2) % m.value for m in coeff_modulus
            ]
            cd.upper_half_threshold = (cd.total_coeff_modulus + 1) >> 1
        else:
            q.parameter_error = ErrorType.INVALID_SCHEME
            return cd

        try:
            cd.rns_tool = HostRNSTool(n, cd.base_q, plain_modulus if parms.scheme != SchemeType.CKKS else Modulus(0))
        except Exception:
            q.parameter_error = ErrorType.FAILED_CREATING_RNS_TOOL
            return cd

        q.using_descending_modulus_chain = all(
            coeff_modulus[i].value > coeff_modulus[i + 1].value for i in range(len(coeff_modulus) - 1)
        )

        cd.galois_tool = GaloisTool(log_n)
        return cd
