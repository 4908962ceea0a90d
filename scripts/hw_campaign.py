"""Unattended hardware campaign: probe the TPU tunnel, run the queued
experiment battery the moment it is up, and record every artifact.

The axon relay that fronts this box's single TPU v5e chip is flaky — it was
down for all of round 3's build time, which left four prepared experiments
unmeasured (NOTES_ROUND4.md items 1-4). This supervisor turns any uptime
window, attended or not, into numbers:

  1. probe:   bounded-subprocess `import jax; jax.devices()` every PROBE_S
  2. on success, run the battery in priority order, each step a subprocess
     with its own hard timeout (a mid-step tunnel drop kills the step, not
     the campaign):
       bench    python bench.py                      (slope-methodology number)
       bisect   python scripts/bisect_pallas_expand.py  (names the Mosaic stage)
       segments python scripts/ab_segments.py           (histogram vs boundaries)
       suite    python -m compute_renderer_tpu.cli benchmarks --batch 64
  3. state + stdout/stderr land in benchmarks/hw_campaign/; completed steps
     are recorded in state.json so the campaign resumes, not restarts, after
     an outage.

Run detached:  nohup python scripts/hw_campaign.py > /tmp/campaign.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "benchmarks" / "hw_campaign"
STATE = OUT / "state.json"

PROBE_S = float(os.environ.get("CAMPAIGN_PROBE_S", "300"))
PROBE_TIMEOUT_S = float(os.environ.get("CAMPAIGN_PROBE_TIMEOUT_S", "240"))
TOTAL_S = float(os.environ.get("CAMPAIGN_TOTAL_S", str(11 * 3600)))

# (name, argv, timeout_s). Suite frames are bounded so one scene's remote
# compile (2-10 min observed round 2) plus measurement fits the timeout.
MAX_STEP_ATTEMPTS = int(os.environ.get("CAMPAIGN_MAX_STEP_ATTEMPTS", "4"))

STEPS = [
    # Round-3 battery (ran green 2026-08-18; kept for resume semantics —
    # state.json marks them done so they are skipped on restart).
    ("bench", [sys.executable, "bench.py"], 3900.0),
    ("bisect", [sys.executable, "scripts/bisect_pallas_expand.py",
                "--iters", "20"], 3600.0),
    ("segments", [sys.executable, "scripts/ab_segments.py",
                  "--iters", "30"], 3600.0),
    ("suite", [sys.executable, "-m", "compute_renderer_tpu.cli",
               "benchmarks", "--batch", "64", "--max-frames", "512",
               "--duration", "5",
               "--json", str(OUT / "suite_round3.json")], 4 * 3600.0),
    # Round-3 FINAL battery: measure what landed after the 08-18 window —
    # the fused Pallas front end is now default-on for eligible scenes, so
    # the suite's San Miguel row should drop ~32 -> ~19 ms; micro_levers
    # turns the round-3 "unmeasured lever" list (worklist, static
    # effect_kind, fused front) into journal numbers.
    ("micro_levers", [sys.executable, "scripts/ab_micro_levers.py",
                      "--iters", "8"], 3600.0),
    ("sort_ab", [sys.executable, "scripts/ab_sort.py",
                 "--iters", "12"], 3600.0),
    ("profile2", [sys.executable, "scripts/profile_mega_hw.py",
                  "--iters", "8"], 3600.0),
    ("suite2", [sys.executable, "-m", "compute_renderer_tpu.cli",
                "benchmarks", "--batch", "64", "--max-frames", "512",
                "--duration", "5",
                "--json", str(OUT / "suite_round3b.json")], 4 * 3600.0),
    ("bench2", [sys.executable, "bench.py"], 3900.0),
]


def log(msg: str) -> None:
    print(f"[campaign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def load_state() -> dict:
    if STATE.exists():
        return json.loads(STATE.read_text())
    return {"done": {}, "attempts": {}}


def save_state(state: dict) -> None:
    STATE.write_text(json.dumps(state, indent=2))


def probe() -> bool:
    """True when a bounded child can see the TPU device AND round-trip one
    tiny dispatch. The tunnel has a half-up failure mode (2026-08-19):
    device enumeration answers while dispatch hangs forever — a
    devices()-only probe would mark it UP and every battery step would
    then burn its full timeout. The matmul + host fetch proves the data
    plane is actually alive."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; d=jax.devices(); print(d); "
             "assert d and d[0].platform != 'cpu'; "
             "x = jnp.ones((8, 128)); "
             "assert float((x @ x.T).sum()) == 8.0 * 128 * 8"],
            timeout=PROBE_TIMEOUT_S, capture_output=True, text=True,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        log("probe: timeout (tunnel down)")
        return False
    ok = r.returncode == 0
    log(f"probe: rc={r.returncode} {'UP' if ok else 'down'} "
        f"{(r.stdout or r.stderr).strip().splitlines()[-1] if (r.stdout or r.stderr).strip() else ''}")
    return ok


def run_step(name: str, argv: list, timeout_s: float, state: dict) -> bool:
    """One battery step as a bounded subprocess; returns success."""
    attempt = state["attempts"].get(name, 0) + 1
    state["attempts"][name] = attempt
    save_state(state)
    out_path = OUT / f"{name}.out.txt"
    err_path = OUT / f"{name}.err.txt"
    log(f"step {name} attempt {attempt}: {' '.join(argv)}")
    # The campaign exists to collect TPU numbers: bench.py's own CPU
    # fallback exiting rc=0 must not mark the step done forever, or the
    # round's headline artifact stays an interpret-mode CPU number even
    # when the tunnel comes back hours later.
    env = dict(os.environ, BENCH_CPU_FALLBACK="0")
    t0 = time.time()
    try:
        with open(out_path, "w") as fo, open(err_path, "w") as fe:
            r = subprocess.run(argv, stdout=fo, stderr=fe,
                               timeout=timeout_s, cwd=ROOT, env=env)
        rc = r.returncode
    except subprocess.TimeoutExpired:
        log(f"step {name}: TIMEOUT after {timeout_s:.0f}s")
        return False
    dt = time.time() - t0
    log(f"step {name}: rc={rc} in {dt:.0f}s")
    if rc == 0:
        state["done"][name] = {"at": time.strftime("%Y-%m-%d %H:%M:%S"),
                               "seconds": round(dt, 1)}
        save_state(state)
        return True
    return False


def main() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    state = load_state()
    deadline = time.time() + TOTAL_S
    log(f"campaign start; steps done: {sorted(state['done'])}")
    while time.time() < deadline:
        # A step that keeps failing WITH the tunnel up (a script bug, a
        # deterministic assert) must not starve the rest of the battery:
        # cap its attempts and move on to the next step.
        pending = [s for s in STEPS
                   if s[0] not in state["done"]
                   and state["attempts"].get(s[0], 0) < MAX_STEP_ATTEMPTS]
        if not pending:
            exhausted = [s[0] for s in STEPS if s[0] not in state["done"]]
            log("all steps complete" if not exhausted else
                f"steps exhausted retries: {exhausted}")
            return 0 if not exhausted else 1
        if not probe():
            time.sleep(PROBE_S)
            continue
        for name, argv, timeout_s in pending:
            if time.time() > deadline:
                break
            if not run_step(name, argv, timeout_s, state):
                # Step failed — re-probe before burning time on the rest.
                break
    log(f"campaign end; done: {sorted(state['done'])}")
    return 0 if len(state["done"]) == len(STEPS) else 1


if __name__ == "__main__":
    sys.exit(main())
