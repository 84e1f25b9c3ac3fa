#!/usr/bin/env python
"""Dump the optimized HLO of the DCCRN remat train step and list every
copy / transpose with its shape + byte size, largest first. Identifies
where the ~15 ms/step of device copies (tools/profile_step.py) come from.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

from profile_step import build_step  # noqa: E402


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
               "s8": 1, "u8": 1, "f64": 8, "c64": 8}


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([0-9,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    train_step, state, mixture, target = build_step(remat=True)
    rng = jax.random.PRNGKey(1)
    lowered = train_step.lower(state, rng, mixture, target)
    text = lowered.compile().as_text()

    rows = []
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.-]+)\s*=\s*(\S+)\s+(copy|transpose)\(", line)
        if m:
            name, shape, kind = m.groups()
            rows.append((shape_bytes(shape), kind, name, shape, line[:180]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} copy/transpose ops, {total/1e6:.1f} MB total write traffic")
    for b, kind, name, shape, line in rows[:40]:
        print(f"  {b/1e6:9.2f} MB  {kind:9s} {name:24s} {line}")


if __name__ == "__main__":
    main()
