"""Regenerate README.md's operator-inventory table from the registry —
the docstring in each ``register(...)`` call is the single source of
truth, so the table can never go stale relative to the code again.

Usage: python scripts/gen_readme_table.py   (rewrites README.md in place)
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
MAX_DOC = 130


def main() -> None:
    import sys

    sys.path.insert(0, str(ROOT))
    from real_time_rides_data_pipeline_spark.registry import registry

    reg = registry()
    lines = [
        "| Key | Oracle | What it covers |",
        "|---|---|---|",
    ]
    for key in sorted(reg):
        spec = reg[key]
        doc = " ".join(spec.doc.split())
        if len(doc) > MAX_DOC:
            doc = doc[:MAX_DOC].rstrip() + "..."
        doc = doc.replace("|", "\\|")
        kind = "rows" if spec.oracle is None else "SQL"
        lines.append(f"| `{key}` | {kind} | {doc} |")
    table = "\n".join(lines)

    readme = (ROOT / "README.md").read_text()
    readme = re.sub(
        r"## Operator inventory \(\d+ query keys\)",
        f"## Operator inventory ({len(reg)} query keys)",
        readme,
    )
    readme = re.sub(
        r"\| Key \| Oracle \| What it covers \|\n\|---\|---\|---\|\n(\|.*\|\n?)+",
        # callable replacement: doc text must be spliced LITERALLY — as a
        # template string, a doc containing \s or \g<...> (regexes are
        # quoted in several docstrings) would crash re.sub or inject group
        # references into README.md
        lambda _m: table + "\n",
        readme,
    )
    (ROOT / "README.md").write_text(readme)
    print(f"wrote {len(reg)} rows")


if __name__ == "__main__":
    main()
