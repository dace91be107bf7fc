"""Summarize a training run log (scripts/validate_e2e.py output) into the
whole-run table docs/PLAN.md wants: eval curve, whole-run vs steady-state
it/s, recompile/growth events and their wall cost, precompiler hits.

Usage: python scripts/report_run.py <run.log>
"""

import re
import sys
from datetime import datetime


def ts(line):
    m = re.match(r"(\d{4})-(\d\d):(\d\d):(\d\d)", line)
    if not m:
        return None
    mmdd, h, mi, s = m.groups()
    return datetime(
        2026, int(mmdd[:2]), int(mmdd[2:]), int(h), int(mi), int(s)
    )


def main(path):
    steps = []  # (time, step, it/s)
    evals = []  # (step, psnr, ssim)
    growth = []
    precompiled = []
    autotunes = []
    overflows = 0
    cur_step = 0
    loop_totals = []
    for line in open(path, errors="replace"):
        m = re.search(r"step (\d+)/(\d+) loss=([\d.]+) \(([\d.]+) it/s\)",
                      line)
        if m:
            cur_step = int(m.group(1))
            steps.append((ts(line), cur_step, float(m.group(4))))
        m = re.search(r"loop timing .*total=([\d.]+)ms", line)
        if m:
            loop_totals.append((cur_step, float(m.group(1))))
        m = re.search(
            r"eval/psnr[\"': ]+([\d.]+)", line
        )
        m2 = re.search(r"psnr=([\d.]+), ssim=\s*([\d.]+)", line)
        if m2:
            evals.append((cur_step, float(m2.group(1)), float(m2.group(2))))
        if "growing capacity" in line or "raising" in line:
            growth.append((ts(line), cur_step, line.strip()[-80:]))
        if "precompiled train step" in line:
            precompiled.append(line.strip()[-70:])
        if "isect autotune" in line:
            autotunes.append(cur_step)
        if "exceeded capacity" in line:
            overflows += 1

    if not steps:
        print("no steps parsed")
        return
    t0, s0, _ = steps[0]
    t1, s1, avg = steps[-1]
    wall = (t1 - t0).total_seconds()
    print(f"steps {s0}..{s1}, wall {wall/60:.1f} min, "
          f"whole-run {avg:.2f} it/s")
    # steady-state: median per-100-step loop total over the last third
    tail = [t for s, t in loop_totals if s > s1 * 2 // 3]
    if tail:
        tail.sort()
        med = tail[len(tail) // 2]
        print(f"steady-state step time (median, last third): {med:.1f} ms "
              f"= {1000/med:.2f} it/s -> whole-run is "
              f"{avg/(1000/med)*100:.0f}% of steady-state")
    print(f"growth/recompile events: {len(growth)}, "
          f"precompiler warms: {len(precompiled)}, "
          f"overflow(zeroed-grad) steps: {overflows}")
    for t, s, line in growth:
        print(f"  step {s}: {line}")
    if evals:
        print("eval curve (step, psnr, ssim):")
        for s, p, ss in evals:
            print(f"  {s:6d}  {p:6.2f}  {ss:.4f}")




def tb_curve(tb_dir):
    """Print the eval curves from a run's tensorboard dir."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    tags = [t for t in acc.Tags()["scalars"] if t.startswith("eval/")]
    series = {t: acc.Scalars(t) for t in tags}
    if not series:
        print("no eval scalars yet")
        return
    steps = [e.step for e in next(iter(series.values()))]
    print("step  " + "  ".join(t.split("/")[1] for t in tags))
    for i, s in enumerate(steps):
        row = "  ".join(
            f"{series[t][i].value:8.4f}" if i < len(series[t]) else "   -"
            for t in tags
        )
        print(f"{s:6d}  {row}")


if __name__ == "__main__":
    if sys.argv[1].endswith(".log"):
        main(sys.argv[1])
    else:
        tb_curve(sys.argv[1])
