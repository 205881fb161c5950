"""Formal environment-bounded closure of the EM-LLM model-based eval.

VERDICT r4 next #6 offered two closes: another base-LM rung, or a formal
closure scoping the claim.  The r4 instrumented negative already
established — with three controls — that the bottleneck is the largest
base LM this image can train, not the memory system; spending another
multi-hour chip run on a fourth model rung buys no new information, so
this records the closure:

* claim scope: "memory system validated; base-model ceiling documented";
* the synthetic-embedding retrieval sweep (32k/65k/131k) is the
  component's capability evidence (hit rates 0.77-0.87 vs recency/random
  floors at 0.0-0.07, oracle 1.0);
* the single 32k model-based row is kept as the measured end-to-end
  attempt, with the three controls restructured into named entries.

Reference: EM-LLM/benchmark/eval.py (the reference's QA harness runs
pretrained 7-8B HF checkpoints; no such checkpoint nor the network to
fetch one exists in this image — the environment bound is structural).

Rewrites the ``model_based`` block of emllm_retrieval_eval.json in
place.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
PATH = os.path.join(HERE, "emllm_retrieval_eval.json")


def main():
    with open(PATH) as f:
        art = json.load(f)
    mb = art["model_based"]
    mb["status"] = "environment_bounded_closure"
    mb["claim_scope"] = (
        "Memory system validated end-to-end on synthetic attention states "
        "(rows above: surprise segmentation + episodic KV + two-stage "
        "retrieval hit 0.77-0.87 of needles at 32k/65k/131k tokens vs "
        "recency/random floors <=0.07); measuring answer accuracy through "
        "REAL attention states requires a base LM with a reliable lookup "
        "circuit, and the ceiling of what one v5e chip + 2 CPU cores can "
        "train in-session (GPT-2 3L/d128, 150k steps: 13-17% in-window "
        "exact match vs 1.6% chance) is documented as the bound.  The "
        "reference's own harness (EM-LLM/benchmark/eval.py) runs "
        "pretrained 7-8B checkpoints, which this image cannot download "
        "(zero egress) or train."
    )
    mb["controls"] = [
        {
            "name": "A_in_window_full_attention",
            "isolates": "base model (memory system not involved)",
            "result": "full attention over one native window containing "
                      "needle + query reaches only 13-17% exact match "
                      "(weak lookup circuit); fails for once-seen keys",
        },
        {
            "name": "B_pure_copy_ablation",
            "isolates": "architecture/training loop",
            "result": "the same model/loop DOES form induction on the "
                      "pure-copy task — architecture and training are "
                      "not the fault",
        },
        {
            "name": "C_ground_truth_retrieval_prefix",
            "isolates": "retrieval quality (oracle retrieval supplied)",
            "result": "even ground-truth retrieved KV prefixes do not "
                      "elicit the answer for once-seen keys — perfect "
                      "retrieval cannot rescue this base model",
        },
    ]
    mb["verdict"] = "environment_bounded_negative_closed"
    mb["rungs_attempted"] = [
        "GPT-2 2L/4H/d64 vocab 16 (r4 early)",
        "GPT-2 3L/4H/d128 vocab 324, 80-150k steps, answer-weighted "
        "loss, curriculum variants (single-token values, 2-token keys, "
        "3-digit values)",
    ]
    with open(PATH, "w") as f:
        json.dump(art, f, indent=1)
    print("closure recorded:", mb["status"], "|", mb["verdict"])


if __name__ == "__main__":
    main()
