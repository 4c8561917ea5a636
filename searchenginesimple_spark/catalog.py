"""Auto-derived operator catalog: the user-facing index of the driver
registry.

``__spark_entry__.queries()`` is the single source of truth for what this
engine exposes (50 entries, each hash-gated against a DuckDB oracle);
discovering the surface should not require reading a 4k-line entry file.
This module renders the registry as a markdown table — entry name, the
implementing callable's ``file:line``, the gate kind (hash vs rows-only),
and the first docstring line — and maintains it inside README.md between
the CATALOG markers.  A test regenerates the table and diffs it against
the README, so the committed catalog can never drift from the registry
(``python -m searchenginesimple_spark.catalog`` refreshes it).
"""

from __future__ import annotations

import inspect
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- OPERATOR CATALOG: AUTO-GENERATED from __spark_entry__.queries() — edit via python -m searchenginesimple_spark.catalog -->"
END = "<!-- END OPERATOR CATALOG -->"


def _summary(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    first = doc.split("\n", 1)[0].strip()
    if len(first) > 96:
        first = first[:93].rstrip() + "…"
    return first.replace("|", "\\|")


def operator_catalog_rows() -> list[tuple[str, str, str, str]]:
    """→ [(entry, file:line, gate, summary)] in registry order."""
    import sys

    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    rows = []
    for name, fn in entry.queries().items():
        f = inspect.unwrap(fn)
        src = os.path.relpath(inspect.getsourcefile(f), _REPO)
        line = inspect.getsourcelines(f)[1]
        gate = "hash" if name in oracles else "rows-only"
        rows.append((name, f"{src}:{line}", gate, _summary(f)))
    return rows


def render_catalog() -> str:
    rows = operator_catalog_rows()
    n_hash = sum(1 for r in rows if r[2] == "hash")
    out = [
        BEGIN,
        "",
        f"{len(rows)} registered entries ({n_hash} hash-gated vs DuckDB, "
        f"{len(rows) - n_hash} rows-only).  Each row's summary is the "
        "implementing callable's first docstring line; multi-leg entries "
        "(mode columns) describe their legs there.",
        "",
        "| # | entry | impl | gate | summary |",
        "|---|---|---|---|---|",
    ]
    for i, (name, where, gate, summary) in enumerate(rows, 1):
        out.append(f"| {i} | `{name}` | `{where}` | {gate} | {summary} |")
    out += ["", END]
    return "\n".join(out)


def update_readme(readme_path: str | None = None) -> bool:
    """Rewrite the catalog section in place; returns True if it changed."""
    readme_path = readme_path or os.path.join(_REPO, "README.md")
    with open(readme_path) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise ValueError(f"README has no catalog markers ({BEGIN!r}…{END!r})")
    head, rest = text.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    new = head + render_catalog() + tail
    if new != text:
        with open(readme_path, "w") as f:
            f.write(new)
        return True
    return False


if __name__ == "__main__":
    print("updated" if update_readme() else "unchanged")
