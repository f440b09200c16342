"""Cross-artifact consistency gate for committed perf JSONs.

Rounds 2 and 3 each committed a self-contradicting perf artifact
(ROOFLINE r2, PROFILE_CLS r3 — a stage-sum implying 0.2 img/s for a model
that benches at 36.1). The failure mode is systemic: artifacts produced by
different scripts were never checked against each other. This gate makes
the cross-checks explicit and runs in the test suite
(tests/test_artifacts_consistency.py) so an inconsistent artifact set
fails CI instead of shipping.

Checks (each skipped when its artifacts are absent):
  1. ROOFLINE.json img_s rows == BENCH_FAMILY.json img_s rows (identity —
     roofline takes its throughput from the bench file).
  2. PROFILE_CLS.json stage-sum throughput reconciles with the
     BENCH_FAMILY row for the same model within RECON_TOL (per-image
     basis, so differing batch sizes are fine to first order).
  3. bench.py's fv0 headline (BENCH_r0N / a fresh run) within
     HEADLINE_TOL of BENCH_FAMILY's fv0 row (relay band is ~±4%).
  4. PROFILE_DOWNSTREAM.json internal identities: encoder_total_6l ≈
     6 × per_enc_layer_fwd; frame times ≥ their contained forward.

Usage: python scripts/check_artifacts.py [--repo DIR]   (exit 1 on fail)
"""
import argparse
import json
import os
import sys

RECON_TOL = 0.25      # PROFILE stage-sum vs end-to-end bench (fractional)
HEADLINE_TOL = 0.08   # bench.py fv0 vs BENCH_FAMILY fv0 (2x relay band)
DOWNSTREAM_TOL = 0.25


def _load(repo, name):
    path = os.path.join(repo, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def check_roofline_vs_family(repo, errors):
    roof = _load(repo, "ROOFLINE.json")
    fam = _load(repo, "BENCH_FAMILY.json")
    if roof is None or fam is None:
        return
    fam_by_model = {r["model"]: r for r in fam if "img_s" in r}
    for row in roof:
        b = fam_by_model.get(row["model"])
        if b is None:
            errors.append(f"ROOFLINE row {row['model']} has no "
                          f"BENCH_FAMILY provenance row")
            continue
        if abs(row["img_s"] - b["img_s"]) > 1e-6 * max(1.0, b["img_s"]):
            errors.append(
                f"ROOFLINE {row['model']} img_s {row['img_s']} != "
                f"BENCH_FAMILY {b['img_s']} (roofline must take its "
                f"throughput from the bench row)")


def check_profile_cls(repo, errors):
    prof = _load(repo, "PROFILE_CLS.json")
    fam = _load(repo, "BENCH_FAMILY.json")
    if prof is None or fam is None:
        return
    profiles = prof if isinstance(prof, list) else [prof]
    fam_by_model = {r["model"]: r for r in fam if "img_s" in r}
    for p in profiles:
        b = fam_by_model.get(p["model"])
        # current schema: standalone stages + a full-model row measured with
        # the same protocol; both reconciliations re-checked here
        img_s = p.get("img_s_full", p.get("img_s_from_sum"))
        if b is not None and img_s is not None:
            ratio = img_s / b["img_s"]
            if not (1 - RECON_TOL <= ratio <= 1 + RECON_TOL):
                errors.append(
                    f"PROFILE_CLS {p['model']}: profile implies "
                    f"{img_s} img/s but BENCH_FAMILY measures "
                    f"{b['img_s']} ({ratio:.3f}x — profile method does not "
                    f"reconcile with end-to-end; tolerance ±{RECON_TOL:.0%})")
        if "sum_stages_ms" in p and "full_ms" in p:
            ratio = p["sum_stages_ms"] / p["full_ms"]
            if not (1 - RECON_TOL <= ratio <= 1 + RECON_TOL):
                errors.append(
                    f"PROFILE_CLS {p['model']}: stage sum "
                    f"{p['sum_stages_ms']} ms vs full forward "
                    f"{p['full_ms']} ms ({ratio:.3f}x outside "
                    f"±{RECON_TOL:.0%})")


def check_headline_vs_family(repo, errors):
    fam = _load(repo, "BENCH_FAMILY.json")
    if fam is None:
        return
    fv0 = next((r for r in fam if r.get("model") == "faster_vit_0_224"), None)
    if fv0 is None:
        return
    # newest BENCH_r0N (driver-recorded headline runs)
    rounds = sorted(n for n in os.listdir(repo)
                    if n.startswith("BENCH_r") and n.endswith(".json"))
    if not rounds:
        return
    bench = _load(repo, rounds[-1])
    parsed = bench.get("parsed") if isinstance(bench, dict) else None
    if not parsed or "value" not in parsed:
        return
    ratio = parsed["value"] / fv0["img_s"]
    if not (1 - HEADLINE_TOL <= ratio <= 1 + HEADLINE_TOL):
        errors.append(
            f"{rounds[-1]} fv0 headline {parsed['value']} vs BENCH_FAMILY "
            f"fv0 {fv0['img_s']}: {ratio:.3f}x outside ±{HEADLINE_TOL:.0%}")


def check_profile_downstream(repo, errors):
    prof = _load(repo, "PROFILE_DOWNSTREAM.json")
    if prof is None:
        return
    for name, rows in prof.items():
        if not isinstance(rows, dict):
            continue
        enc6 = rows.get("encoder_total_6l")
        per = rows.get("per_enc_layer_fwd")
        if enc6 and per:
            ratio = enc6 / (6 * per)
            if not (1 - DOWNSTREAM_TOL <= ratio <= 1 + DOWNSTREAM_TOL):
                errors.append(
                    f"PROFILE_DOWNSTREAM {name}: encoder_total_6l {enc6} "
                    f"vs 6x per_enc_layer_fwd {6 * per:.3f} "
                    f"({ratio:.2f}x outside ±{DOWNSTREAM_TOL:.0%})")
        full = rows.get("fwd_full")
        for frame_key in ("frame_exact_f32",):
            frame = rows.get(frame_key)
            # a full streaming frame contains at least the full forward
            if full and frame and frame < 0.8 * full:
                errors.append(
                    f"PROFILE_DOWNSTREAM {name}: {frame_key} {frame} < "
                    f"0.8x fwd_full {full} — frame can't be faster than "
                    f"its own forward")


def run_all(repo):
    errors = []
    check_roofline_vs_family(repo, errors)
    check_profile_cls(repo, errors)
    check_headline_vs_family(repo, errors)
    check_profile_downstream(repo, errors)
    return errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()
    errors = run_all(args.repo)
    for e in errors:
        print(f"FAIL: {e}")
    if errors:
        sys.exit(1)
    print("artifact set consistent")


if __name__ == "__main__":
    main()
