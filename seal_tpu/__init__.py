"""seal-tpu: TPU-native homomorphic encryption (BFV/BGV/CKKS over RNS).

A from-scratch JAX/XLA/Pallas framework with the capabilities of Microsoft
SEAL (reference surveyed in SURVEY.md).  Public API mirrors the reference's
actor surface: EncryptionParameters/SEALContext, KeyGenerator, Encryptor,
Decryptor, Evaluator, BatchEncoder, CKKSEncoder.
"""

from .modulus import (
    CoeffModulus,
    Modulus,
    PlainModulus,
    SecurityLevel,
)

__version__ = "0.1.0"
