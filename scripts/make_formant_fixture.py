"""Shared formant-fixture + config generator for the TPU e2e scripts.

One implementation used by BOTH scripts/e2e_formant_tpu.sh and
scripts/prep_ringformer_e2e.sh (round-3 advisor finding: the heredoc was
duplicated verbatim and the two copies could drift, silently
invalidating regenerated caches).

usage: python scripts/make_formant_fixture.py WORKDIR
Writes WORKDIR/data (48 train + 8 val formant segments, seed 11, with
pitch/alignment caches), WORKDIR/config.yml, WORKDIR/model.yml.

NOTE on training_plan epochs: only the alignment entry matters to the
prep path (it drives train-align). The acoustic/textual/duration epochs
written here are the freegan e2e recipe; the ringformer run overrides
its acoustic epoch count via e2e_ringformer_tpu.sh's EPOCHS argument
and never reads this config's value.
"""

import os
import sys

_repo = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(_repo, "tests"))
sys.path.insert(0, _repo)  # fixtures.py imports stylish_tts_tpu (not pip-installed)

import yaml  # noqa: E402

from fixtures import make_micro_dataset  # noqa: E402


def main(work: str) -> None:
    make_micro_dataset(
        os.path.join(work, "data"), n_train=48, n_val=8,
        with_caches=True, voice="formant", seed=11,
    )
    cfg = {
        "training": {
            "log_interval": 10, "save_interval": 200, "val_interval": 100,
            "device": "tpu", "mixed_precision": "bf16", "data_workers": 2,
        },
        "training_plan": {
            "alignment": {"epochs": 30, "probe_batch_max": 8, "lr": 2e-4},
            "acoustic": {"epochs": 40, "probe_batch_max": 8, "lr": 1e-4},
            "textual": {"epochs": 15, "probe_batch_max": 8, "lr": 3e-5},
            "duration": {"epochs": 15, "probe_batch_max": 8, "lr": 1e-4},
        },
        "dataset": {
            "path": os.path.join(work, "data"),
            "train_data": "train-list.txt", "val_data": "val-list.txt",
            "wav_path": "wav-dir", "pitch_path": "pitch.safetensors",
            "alignment_path": "alignment.safetensors",
            "alignment_model_path": "alignment_model.safetensors",
        },
        "validation": {"sample_count": 4},
    }
    with open(os.path.join(work, "config.yml"), "w") as f:
        f.write(yaml.dump(cfg))
    # explicit opt-in to the structural-only random WavLM (zero egress)
    with open(os.path.join(work, "model.yml"), "w") as f:
        f.write(yaml.dump({"slm": {"allow_random_fallback": True}}))
    print("formant fixture ready")


if __name__ == "__main__":
    main(sys.argv[1])
