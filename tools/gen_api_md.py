"""Regenerate docs/API.md from source docstrings (one line per public
function/class).  Run: python tools/gen_api_md.py"""

from __future__ import annotations

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
PKG = ROOT / "flink_rtcef_spark"
HEADER = [
    "# API reference — public surface by module",
    "",
    "One line per public function/class, first docstring sentence",
    "(generated from source docstrings; regenerate with",
    "`python tools/gen_api_md.py`).  For reference-to-engine entry-point mapping",
    "see `docs/MIGRATION.md`; for per-family scale rationale see",
    "`docs/scale-design.md`.",
    "",
]


def main() -> None:
    lines = list(HEADER)
    for sub in ("plans", "operators", "models", "functions", "sources",
                "streaming", "queries"):
        for p in sorted((PKG / sub).glob("*.py")):
            if p.name.startswith("_"):
                continue
            tree = ast.parse(p.read_text())
            mod_doc = (ast.get_docstring(tree) or "").split("\n")[0].rstrip(" —-")
            fns = []
            for node in tree.body:
                if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                    d = " ".join((ast.get_docstring(node) or "").split(".")[0].split())
                    fns.append((f"`{node.name}`", d[:140]))
                if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                    d = " ".join((ast.get_docstring(node) or "").split(".")[0].split())
                    fns.append((f"`{node.name}` *(class)*", d[:140]))
            if fns:
                lines.append(f"## `{sub}/{p.name}` — {mod_doc}")
                lines.append("")
                lines.extend(f"- {n} — {d}" for n, d in fns)
                lines.append("")
    (ROOT / "docs" / "API.md").write_text("\n".join(lines) + "\n")
    print(f"wrote docs/API.md ({len(lines)} lines)")


if __name__ == "__main__":
    main()
