"""Shared helper: extract collective operand sizes from a lowered program.

ADVICE r3: Lowered.as_text() emits StableHLO MLIR ('stablehlo.all_reduce',
'tensor<...xf32>'), so regexes written against classic HLO text
('all-reduce', 'f32[...]') match NOTHING and the size assertions never run.
We lower to the classic HLO dialect explicitly and parse the all-reduce
result types (for all-reduce, result type == operand type); callers must
assert the returned list is NON-EMPTY so the check can never silently go
vacuous again.
"""

import re

import numpy as np


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1}


def all_reduce_operand_sizes(lowered, bytes_per_elem=None):
    """Return a list of (shape_string, nbytes) for every all-reduce operand
    in the compiled-dialect HLO of `lowered` (a jax Lowered object).

    Bytes are derived from the matched element dtype (ADVICE r4: an f64 or
    bf16 lowering must be measured, not silently dropped). bytes_per_elem
    overrides the per-dtype size when given (legacy callers)."""
    txt = lowered.as_text(dialect="hlo")
    out = []
    for line in txt.splitlines():
        if "all-reduce(" not in line:
            continue
        head = line.split("all-reduce(")[0]
        # result types precede the op name: `x = f32[4,28]{1,0} all-reduce(`
        # or tuple form `x = (f32[..], f64[..]) all-reduce(`
        for dt, dims in re.findall(
                r"(f64|f32|bf16|f16|s32|u32|pred)\[([0-9,]*)\]", head):
            n = int(np.prod([int(x) for x in dims.split(",") if x] or [1]))
            bpe = (bytes_per_elem if bytes_per_elem is not None
                   else _DTYPE_BYTES[dt])
            out.append((f"{dt}[{dims}]", n * bpe))
    return out
