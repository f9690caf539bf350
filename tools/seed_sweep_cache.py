"""One-time bootstrap of SCALE_SWEEP_CACHE.json from a previous
round's sweep artifact (VERDICT r11 #3).

The cross-round cache normally populates itself as sweeps run fresh
queries.  Its FIRST round would re-run everything; but the previous
round's artifact is valid evidence for any query whose semantic
fingerprint (tools/plan_fingerprint.py) is IDENTICAL between the tree
the old sweep ran on and today's tree — same normalized plan, same
defining-module bytes, same oracle text, same gate harness.  This
tool compares fingerprint maps computed at both trees and seeds the
cache with the old artifact's green cells ONLY where the keys match;
any query whose code, oracle, or harness changed since the old sweep
(or whose fingerprint failed at either tree) is left out and will run
fresh.

Usage:
    python3 tools/seed_sweep_cache.py OLD_FPS.json NEW_FPS.json \
        OLD_ARTIFACT.json REPLICA_DIR
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _HERE)

from plan_fingerprint import replica_fingerprint  # noqa: E402
from sweep_scale import CACHE_PATH, _green  # noqa: E402


def main() -> int:
    old_fps_path, new_fps_path, artifact_path, replica_dir = sys.argv[1:5]
    with open(old_fps_path) as f:
        old_fps = json.load(f)
    with open(new_fps_path) as f:
        new_fps = json.load(f)
    with open(artifact_path) as f:
        artifact = json.load(f)
    replica_fp = replica_fingerprint(replica_dir)

    cache: dict[str, dict] = {}
    if os.path.exists(CACHE_PATH):
        with open(CACHE_PATH) as f:
            cache = json.load(f)

    seeded, skipped_rekeyed, skipped_notgreen = [], [], []
    for name, cell in artifact.items():
        if name.startswith("__"):
            continue
        key = new_fps.get(name)
        if not key or old_fps.get(name) != key:
            skipped_rekeyed.append(name)
            continue
        if not _green(cell):
            skipped_notgreen.append(name)
            continue
        clean = {k: v for k, v in cell.items() if k != "provenance"}
        cache[name] = {
            "key": key,
            "replica_fp": replica_fp,
            "artifact": os.path.basename(artifact_path),
            "cell": clean,
        }
        seeded.append(name)

    with open(CACHE_PATH, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    print(
        f"seeded {len(seeded)} entries from "
        f"{os.path.basename(artifact_path)} (replica {replica_fp}); "
        f"{len(skipped_rekeyed)} re-keyed (will run fresh), "
        f"{len(skipped_notgreen)} not green"
    )
    if skipped_rekeyed:
        print("re-keyed:", sorted(skipped_rekeyed))
    if skipped_notgreen:
        print("not green:", sorted(skipped_notgreen))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
