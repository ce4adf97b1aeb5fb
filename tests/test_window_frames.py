"""Source lint pinning VERDICT r7 #4: no unpartitioned Window.orderBy
over a fact-table-sized frame.

Every unpartitioned ``Window.orderBy`` site in the package must either
(a) carry a ``# frame:`` annotation stating why its frame is bounded
(day/month/vocab/decile/bin grain, top-k limit, or the two-phase
bucket-offset frame), or (b) live in the two-phase helper itself
(operators/ranks.py, whose offsets window is bucket-cardinality by
construction). Data-sized sites were rewritten onto
``ranks.two_phase_ordered`` in round 8; a new data-sized site must use
the helper, not add an annotation it doesn't deserve.
"""

from __future__ import annotations

import glob
import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "distributed_map_reduce_spark",
)


def test_every_unpartitioned_window_is_annotated_or_two_phase():
    offenders = []
    for path in sorted(glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)):
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines, 1):
            if not re.search(r"(Window|W)\.orderBy", line):
                continue
            if "partitionBy" in line or line.lstrip().startswith("#"):
                continue
            # docstring/comment mentions
            if "``" in line or line.lstrip().startswith(('"""', "'''")):
                continue
            annotated = "# frame:" in line or (
                i >= 2 and "# frame:" in lines[i - 2]
            )
            in_helper = path.endswith(os.path.join("operators", "ranks.py"))
            if not (annotated or in_helper):
                offenders.append(f"{os.path.relpath(path, PKG)}:{i}: {line.strip()}")
    assert not offenders, (
        "unpartitioned Window.orderBy without a '# frame:' bound "
        "annotation (rewrite data-sized frames with "
        "operators/ranks.two_phase_ordered):\n" + "\n".join(offenders)
    )
