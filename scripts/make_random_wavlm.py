"""Generate a local HF-format WavLM checkpoint for the SLM loss.

This environment has zero egress, so the pretrained
microsoft/wavlm-base-plus weights cannot be downloaded.  This script
materializes a randomly initialized WavLMModel with the base-plus
architecture (hidden 768, 12 layers, 12 heads — the exact config the
reference's SLM loss wraps, reference losses.py:376-394) so the FULL
slm code path (torch->flax conversion, frozen forward, L1 hidden-state
loss, its gradient) runs in real training and its step-time cost is
measurable.  With network access, point model.yml slm.model at the real
hub id instead and the same path loads pretrained weights.

Usage: python scripts/make_random_wavlm.py [out_dir]
"""

import sys

import torch
from transformers import WavLMConfig, WavLMModel


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "assets/wavlm-random"
    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
    )
    model = WavLMModel(cfg)
    model.save_pretrained(out)
    print(f"wrote random-init WavLM (base-plus arch) to {out}")


if __name__ == "__main__":
    main()
