"""One controlled scaling window, BOTH pairs (round-3 VERDICT next #8).

Runs, back-to-back in a single window with nothing else on the box:

  1. hardware ceilings (hw_control.py) for the (2,8) and (8,32) pairs,
  2. the pinned alternating pipeline campaign (scaling_bench.py) for
     the (2,8) pair, then for the (8,32) pair,
  3. the hardware ceilings again (before/after brackets — the ceiling
     moves with host weather, so the brackets date-stamp the window),

and prints ONE JSON object holding every sample, so the round's
criterion table in BASELINE.md is a transcription of a single
artifact instead of a cross-session collage (retiring the
which-pair-counts dispute).

RESUMABLE: the harness session owns the tmux server, so when the
session dies every campaign process dies with it (this killed two
round-4 attempts mid-pair).  Each completed stage is appended to a
durable state file, and the pipeline stages additionally persist at
single-sample granularity (scaling_bench.py state files); a rerun
skips everything already recorded.  "Single window" then means the
samples span the shortest window the harness allows — the before/after
ceiling brackets still bound whatever window actually occurred, and
the state file timestamps every stage.

Usage: python scripts/scaling_campaign.py [n_images] [repeats] [state_dir]
       (defaults 600000, 2, /tmp/campaign_r4_state — ~80 min on this VM)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _now() -> str:
    return dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")


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


def _pipeline(
    n: int, repeats: int, pair: tuple[int, int], state_dir: str
) -> dict:
    sample_state = os.path.join(state_dir, f"pair_{pair[0]}_{pair[1]}.jsonl")
    return _last_json(
        [sys.executable, os.path.join(HERE, "scaling_bench.py"),
         str(n), str(repeats), str(pair[0]), str(pair[1]), sample_state]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    state_dir = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/campaign_r4_state"
    )
    os.makedirs(state_dir, exist_ok=True)
    stages_file = os.path.join(state_dir, "stages.jsonl")
    done: dict[str, dict] = {}
    if os.path.exists(stages_file):
        with open(stages_file) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["stage"]] = rec["r"]

    def stage(name: str, fn) -> dict:
        if name in done:
            print(json.dumps({"stage": name, "r": done[name],
                              "resumed": True}), flush=True)
            return done[name]
        r = fn()
        r["_utc"] = _now()
        with open(stages_file, "a") as fh:
            fh.write(json.dumps({"stage": name, "r": r}) + "\n")
        print(json.dumps({"stage": name, "r": r}), flush=True)
        return r

    out: dict = {
        "campaign": "round-4 single-window, both pairs",
        "n_images": n,
        "repeats": repeats,
        "started_utc": _now(),
    }
    out["ceiling_2_8_before"] = stage(
        "ceiling_2_8_before", lambda: _ceiling((2, 8)))
    out["ceiling_8_32_before"] = stage(
        "ceiling_8_32_before", lambda: _ceiling((8, 32)))
    out["pair_2_8"] = stage(
        "pair_2_8", lambda: _pipeline(n, repeats, (2, 8), state_dir))
    out["pair_8_32"] = stage(
        "pair_8_32", lambda: _pipeline(n, repeats, (8, 32), state_dir))
    out["ceiling_2_8_after"] = stage(
        "ceiling_2_8_after", lambda: _ceiling((2, 8)))
    out["ceiling_8_32_after"] = stage(
        "ceiling_8_32_after", lambda: _ceiling((8, 32)))
    out["finished_utc"] = _now()
    final = os.path.join(state_dir, "campaign_final.json")
    with open(final, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
