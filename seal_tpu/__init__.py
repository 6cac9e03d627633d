"""seal-tpu: TPU-native homomorphic encryption (BFV/BGV/CKKS over RNS).

A from-scratch JAX/XLA framework with the capabilities of Microsoft SEAL
(reference surveyed in SURVEY.md).  Public API mirrors the reference's actor
surface: EncryptionParameters/SealContext, KeyGenerator, Encryptor,
Decryptor, Evaluator, BatchEncoder, CKKSEncoder — plus the new multi-chip
layer in ``seal_tpu.parallel``.
"""

from .modulus import CoeffModulus, Modulus, PlainModulus, SecurityLevel
from .params import EncryptionParameters, ParmsId, PARMS_ID_ZERO, SchemeType
from .context import SealContext, EncryptionParameterQualifiers, ErrorType
from .data import (
    Ciphertext,
    GaloisKeys,
    KSwitchKeys,
    Plaintext,
    PublicKey,
    RelinKeys,
    SecretKey,
)
from .keygen import KeyGenerator
from .encryptor import Encryptor
from .decryptor import Decryptor
from .evaluator import Evaluator
from .encoders import BatchEncoder
from .ckks_encoder import CKKSEncoder
from .utils import print_parameters

__version__ = "0.1.0"

__all__ = [
    "BatchEncoder", "CKKSEncoder", "Ciphertext", "CoeffModulus", "Decryptor",
    "EncryptionParameterQualifiers", "EncryptionParameters", "Encryptor",
    "ErrorType", "Evaluator", "GaloisKeys", "KSwitchKeys", "KeyGenerator",
    "Modulus", "PARMS_ID_ZERO", "ParmsId", "PlainModulus", "Plaintext",
    "PublicKey", "RelinKeys", "SchemeType", "SealContext", "SecretKey",
    "SecurityLevel", "print_parameters",
]
