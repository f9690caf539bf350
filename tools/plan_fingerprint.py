"""Per-query semantic fingerprints for cross-round 100x verdict
caching (VERDICT r11 task 3).

The 100x sweep's wall cost is dominated by re-proving queries whose
plan did not change since their last green verdict.  A verdict is a
function of (the query's execution semantics, the oracle SQL, the
data it ran on, the compare harness) — so each query gets a key:

    sha256( normalized analyzed logical plan at sf0.001
          + sha256 of the defining module's source file
          + oracle SQL (+ staged-oracle statements)
          + sha256 of tools/check_oracle.py )

and the sweep separately fingerprints the REPLICA (sorted table file
names + sizes).  Unchanged key + unchanged replica => the cached
verdict is evidence for this round's cell (recorded with provenance);
any change re-keys and forces a fresh run.

Why each component:
- the ANALYZED plan (pre-cache-substitution) captures the logical
  computation including literals/seeds, normalized for expression ids
  (``#123``), object addresses and the sf-dir path — stable across
  sessions, changes whenever the query's semantics change;
- the defining-file hash closes the plan's blind spot: a pandas-UDF
  BODY edit doesn't show in the plan string (the function prints as a
  normalized object), but it lives in the same module file, so any
  edit to that file re-keys every query it defines — over-invalidates
  a little, never under-invalidates;
- the defining file's TRANSITIVE intra-package import closure
  (ADVICE r12 item 2): UDF bodies import shared code at runtime
  (e.g. plans/mmq.py's decode UDFs call operators/codecs.py), so an
  edit to a shared module changes semantics without touching the
  defining file or the plan string.  A static scan resolves every
  ``from .x import`` / ``from ..pkg.mod import`` /
  ``import distributedmapreduce_spark...`` statement ANYWHERE in the
  file (deferred in-function imports included — that's the executor
  pickling pattern), recurses, and folds the sorted closure's file
  hashes into the key.  session.py (runtime config) is folded into
  every key unconditionally;
- oracle + staged-oracle text: a changed oracle is a changed claim;
- check_oracle.py: the gate itself (canonicalization, float rounding)
  is part of what a verdict means.

Building every registry frame at sf0.001 does run the driver-side
loops of iterative queries (kmeans etc. collect at build time), but
at sf0.001 that is seconds — vs the hours the cache saves at 100x.
"""

from __future__ import annotations

import hashlib
import inspect
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

FP_SF = "/root/testdata/sf0.001"

_ID_RE = re.compile(r"#\d+")
_ADDR_RE = re.compile(r"0x[0-9a-fA-F]+")
_AT_RE = re.compile(r"@[0-9a-fA-F]{6,}")


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _file_sha(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def normalize_plan(plan: str, sf_dir: str) -> str:
    plan = plan.replace(os.path.realpath(sf_dir), "<SF>")
    plan = plan.replace(sf_dir, "<SF>")
    plan = _ID_RE.sub("#", plan)
    plan = _ADDR_RE.sub("0x", plan)
    return _AT_RE.sub("@", plan)


_PKG_ROOT = os.path.join(_REPO, "distributedmapreduce_spark")
_PKG_NAME = "distributedmapreduce_spark"
_REL_IMP_RE = re.compile(r"^\s*from\s+(\.+)([\w.]*)\s+import", re.M)
_ABS_IMP_RE = re.compile(
    rf"^\s*(?:from\s+{_PKG_NAME}([\w.]*)\s+import|import\s+{_PKG_NAME}([\w.]*))",
    re.M,
)


def _resolve_module_file(pkg_dir: str, dotted: str) -> str | None:
    """Resolve a dotted module path relative to pkg_dir to a .py file
    (module file, else package __init__).  Returns None if the final
    component is an attribute of a package rather than a module."""
    base = os.path.join(pkg_dir, *dotted.split(".")) if dotted else pkg_dir
    for cand in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.exists(cand):
            return cand
    # `from ..operators.codecs import decode_avi` resolves above;
    # `from .llm3 import _md5_u32` resolves above; a miss means the
    # last component was an attribute — try the parent module file
    if "." in dotted:
        return _resolve_module_file(pkg_dir, dotted.rsplit(".", 1)[0])
    return None


def _intra_deps(src_path: str, seen: set[str] | None = None) -> set[str]:
    """Transitive closure of intra-package imports of a source file —
    INCLUDING deferred in-function imports (the executor-pickling
    pattern), which a runtime module-dict walk would miss."""
    seen = seen if seen is not None else set()
    real = os.path.realpath(src_path)
    if real in seen or not real.startswith(_PKG_ROOT):
        return seen
    seen.add(real)
    try:
        with open(real, "r", encoding="utf-8") as f:
            text = f.read()
    except OSError:
        return seen
    targets: list[str] = []
    for m in _REL_IMP_RE.finditer(text):
        dots, dotted = m.group(1), m.group(2)
        pkg_dir = os.path.dirname(real)
        for _ in range(len(dots) - 1):
            pkg_dir = os.path.dirname(pkg_dir)
        if not pkg_dir.startswith(os.path.dirname(_PKG_ROOT)):
            continue
        t = _resolve_module_file(pkg_dir, dotted)
        if t:
            targets.append(t)
    for m in _ABS_IMP_RE.finditer(text):
        dotted = (m.group(1) or m.group(2) or "").lstrip(".")
        t = _resolve_module_file(_PKG_ROOT, dotted)
        if t:
            targets.append(t)
    for t in targets:
        _intra_deps(t, seen)
    return seen


def closure_hash(src_path: str, cache: dict[str, str]) -> str:
    """Combined hash of src_path's intra-package import closure
    (excluding src_path itself, which is hashed separately)."""
    real = os.path.realpath(src_path)
    if real not in cache:
        deps = sorted(_intra_deps(real) - {real})
        cache[real] = _sha(
            "\n".join(
                f"{os.path.relpath(d, _REPO)}:{_file_sha(d)}" for d in deps
            )
        )[:24]
    return cache[real]


def replica_fingerprint(sf_dir: str) -> str:
    """Fingerprint a test-data/replica dir: table file names + sizes.
    gen_scale.py writes deterministically, so a regenerated same-factor
    replica keeps its fingerprint; any content drift re-keys (a miss
    only costs a re-run, never a wrong cached verdict)."""
    parts = []
    for root, dirs, files in sorted(os.walk(sf_dir)):
        dirs.sort()
        for f in sorted(files):
            if f.startswith(("_", ".")) or f.endswith(".crc"):
                continue
            p = os.path.join(root, f)
            parts.append(f"{os.path.relpath(p, sf_dir)}:{os.path.getsize(p)}")
    return _sha("\n".join(parts))[:16]


def query_fingerprints(names=None, fp_sf: str = FP_SF) -> dict[str, str | None]:
    """Return name -> key (None where fingerprinting failed; a None
    key never cache-hits, so failures degrade to fresh runs)."""
    from distributedmapreduce_spark.plans.registry import get_registry
    from distributedmapreduce_spark.session import get_spark

    reg = get_registry()
    if names is None:
        names = sorted(reg)
    harness = _file_sha(os.path.join(_HERE, "check_oracle.py"))
    session_sha = _file_sha(os.path.join(_PKG_ROOT, "session.py"))
    spark = get_spark(app_name="plan_fingerprint", cpus=8)
    src_cache: dict[str, str] = {}
    clo_cache: dict[str, str] = {}
    out: dict[str, str | None] = {}
    for name in names:
        q = reg[name]
        try:
            df = q.fn(spark, fp_sf)
            plan = normalize_plan(
                df._jdf.queryExecution().analyzed().toString(), fp_sf
            )
            src = inspect.getsourcefile(q.fn) or "<?>"
            if src not in src_cache:
                src_cache[src] = (
                    _file_sha(src) if os.path.exists(src) else "<?>"
                )
            clo = (
                closure_hash(src, clo_cache)
                if os.path.exists(src)
                else "<?>"
            )
            staged = "\n--\n".join(q.staged_oracle or [])
            out[name] = _sha(
                f"{plan}\n==SRC=={src_cache[src]}\n==DEPS=={clo}"
                f"\n==SESSION=={session_sha}\n==ORACLE=="
                f"{q.oracle or ''}\n==STAGED=={staged}"
                f"\n==HARNESS=={harness}"
            )[:24]
        except Exception as e:  # noqa: BLE001 — degrade to fresh run
            print(f"fingerprint FAILED for {name}: {e!r}", file=sys.stderr)
            out[name] = None
    return out


_PYEVAL_RE = re.compile(
    r"MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"
    r"|ArrowEvalPython|BatchEvalPython|PythonUDF|mapInArrow",
    re.I,
)


def query_components(names=None, fp_sf: str = FP_SF) -> dict[str, dict]:
    """Per-query SEMANTIC SUB-COMPONENTS for cross-tree seeding of
    module-rekeyed queries (SCALE.md §15i).  The full key folds in the
    defining module + import-closure bytes because Python UDF bodies
    and artifact-builder code are invisible in the plan string; but
    for a query whose executed semantics live ENTIRELY in the JVM
    plan — no Python-eval node anywhere in the analyzed plan, and
    every relation a <SF> table scan (no engine-written artifact
    paths) — the normalized analyzed plan + oracle + gate IS the
    semantics, and bit-identity of those across two trees makes a
    green verdict from either tree evidence for both.  Queries with a
    Python stage or an artifact read keep the strict module-level
    keying (``seedable: False``)."""
    from distributedmapreduce_spark.plans.registry import get_registry
    from distributedmapreduce_spark.session import get_spark

    reg = get_registry()
    if names is None:
        names = sorted(reg)
    harness = _file_sha(os.path.join(_HERE, "check_oracle.py"))
    spark = get_spark(app_name="plan_components", cpus=8)
    out: dict[str, dict] = {}
    for name in names:
        q = reg[name]
        try:
            df = q.fn(spark, fp_sf)
            plan = normalize_plan(
                df._jdf.queryExecution().analyzed().toString(), fp_sf
            )
            staged = "\n--\n".join(q.staged_oracle or [])
            pyeval = bool(_PYEVAL_RE.search(plan))
            # any scan outside the <SF> dir (warehouse/index/tmp
            # artifacts) means fn() ran engine code whose semantics
            # the plan cannot attest
            nonsf = bool(
                re.search(r"parquet [^\n]*(?:warehouse|/tmp/|indexes)",
                          plan)
            ) or ("spark-warehouse" in plan)
            out[name] = {
                "sem": _sha(
                    f"{plan}\n==ORACLE=={q.oracle or ''}"
                    f"\n==STAGED=={staged}\n==HARNESS=={harness}"
                )[:24],
                "seedable": not pyeval and not nonsf,
            }
        except Exception as e:  # noqa: BLE001 — degrade to fresh run
            print(f"components FAILED for {name}: {e!r}", file=sys.stderr)
            out[name] = {"sem": None, "seedable": False}
    return out


if __name__ == "__main__":
    import json

    if len(sys.argv) > 1 and sys.argv[1] == "--components":
        print(json.dumps(
            query_components(sys.argv[2:] or None), indent=1,
            sort_keys=True,
        ))
    else:
        fps = query_fingerprints(sys.argv[1:] or None)
        print(json.dumps(fps, indent=1, sort_keys=True))
