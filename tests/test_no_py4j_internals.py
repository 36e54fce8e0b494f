"""Guard: no py4j/private-JVM internals anywhere in the package (VERDICT r8 item 2).

SURVEY §7.3 forbids `_jvm`/`_jdf`-style internals: they are undocumented,
version-fragile, and absent entirely under Spark Connect (no `_jsc` on a
Connect session's context). Round 8 shipped exactly one such usage
(ops/materialize.py read `sc._jsc.sc().getCheckpointDir()`); it was replaced
with the public `SparkContext.getCheckpointDir()` in round 9. This test keeps
the package clean: it scans every shipped source file (package + entry points
+ tools) for dot-prefixed private-JVM attribute accesses, so a comment that
merely *mentions* `_jsc` does not trip it but real code does.
"""

from __future__ import annotations

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent

# Attribute accesses on the py4j bridge: ._jsc ._jvm ._jdf ._jgd ._jrdd
# ._jseq ._jmap ._jconf ._jsparkSession — anything `._j<letters>`.
_PRIVATE_JVM = re.compile(r"\._j[a-zA-Z]+\b")


def _shipped_sources():
    roots = [REPO / "swallow_spark", REPO / "tools"]
    files = [REPO / "__spark_entry__.py", REPO / "bench.py"]
    for root in roots:
        files.extend(p for p in root.rglob("*.py") if "__pycache__" not in p.parts)
    return files


def test_no_private_jvm_attribute_access():
    hits = []
    for path in _shipped_sources():
        text = path.read_text(encoding="utf-8")
        for lineno, line in enumerate(text.splitlines(), start=1):
            code = line.split("#", 1)[0]  # strip trailing comments
            if _PRIVATE_JVM.search(code):
                hits.append(f"{path.relative_to(REPO)}:{lineno}: {line.strip()}")
    assert not hits, (
        "private py4j/JVM attribute access found (breaks under Spark Connect; "
        "SURVEY §7.3):\n" + "\n".join(hits)
    )
