"""Introspection helpers (counterpart of ``examples/examples.h`` utilities)."""

from __future__ import annotations

from .context import SealContext
from .params import SchemeType


def print_parameters(context: SealContext) -> str:
    """Pretty string of the encryption parameters (cf. print_parameters)."""
    cd = context.key_context_data()
    parms = cd.parms
    scheme = parms.scheme.name
    lines = ["/", "| Encryption parameters :", f"|   scheme: {scheme}",
             f"|   poly_modulus_degree: {parms.poly_modulus_degree}"]
    bits = [m.bit_count for m in parms.coeff_modulus]
    lines.append(
        f"|   coeff_modulus size: {sum(bits)} ({' + '.join(map(str, bits))}) bits"
    )
    if parms.scheme in (SchemeType.BFV, SchemeType.BGV):
        lines.append(f"|   plain_modulus: {parms.plain_modulus.value}")
    lines.append("\\")
    s = "\n".join(lines)
    print(s)
    return s
