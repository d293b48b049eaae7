"""One controlled scaling window, BOTH pairs (round-3 VERDICT next #8).

Runs, back-to-back in a single same-hour window with nothing else on
the box:

  1. hardware ceilings (hw_control.py) for the (2,8) and (8,32) pairs,
  2. the pinned alternating pipeline campaign (scaling_bench.py) for
     the (2,8) pair, then for the (8,32) pair,
  3. the hardware ceilings again (before/after brackets — the ceiling
     moves with host weather, so the brackets date-stamp the window),

and prints ONE JSON object holding every sample, so the round's
criterion table in BASELINE.md is a transcription of a single
artifact instead of a cross-session collage (retiring the
which-pair-counts dispute).

Usage: python scripts/scaling_campaign.py [n_images] [repeats]
       (defaults 600000, 2 — ~80 min on this VM)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _last_json(cmd: list[str]) -> dict:
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"{cmd} failed")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{cmd} printed no JSON")


def _ceiling(pair: tuple[int, int]) -> dict:
    return _last_json(
        [sys.executable, os.path.join(HERE, "hw_control.py"),
         "150", str(pair[0]), str(pair[1])]
    )


def _pipeline(n: int, repeats: int, pair: tuple[int, int]) -> dict:
    return _last_json(
        [sys.executable, os.path.join(HERE, "scaling_bench.py"),
         str(n), str(repeats), str(pair[0]), str(pair[1])]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out: dict = {
        "campaign": "round-4 single-window, both pairs",
        "n_images": n,
        "repeats": repeats,
        "started_utc": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
    }
    out["ceiling_2_8_before"] = _ceiling((2, 8))
    print(json.dumps({"stage": "ceiling_2_8_before",
                      "r": out["ceiling_2_8_before"]}), flush=True)
    out["ceiling_8_32_before"] = _ceiling((8, 32))
    print(json.dumps({"stage": "ceiling_8_32_before",
                      "r": out["ceiling_8_32_before"]}), flush=True)
    out["pair_2_8"] = _pipeline(n, repeats, (2, 8))
    print(json.dumps({"stage": "pair_2_8", "r": out["pair_2_8"]}), flush=True)
    out["pair_8_32"] = _pipeline(n, repeats, (8, 32))
    print(json.dumps({"stage": "pair_8_32", "r": out["pair_8_32"]}),
          flush=True)
    out["ceiling_2_8_after"] = _ceiling((2, 8))
    out["ceiling_8_32_after"] = _ceiling((8, 32))
    out["finished_utc"] = dt.datetime.now(dt.timezone.utc).isoformat(
        timespec="seconds"
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
