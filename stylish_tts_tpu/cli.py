"""Command-line interface.

Parity with the reference console scripts
(reference: train/cli.py:43-428 `stylish-train` with subcommands
train-align/align/align-textgrid/pitch/train/convert/voicepack, and
tts/cli.py:13-96 `stylish-tts speak`).
"""

from __future__ import annotations

import logging
import os
import os.path as osp

import click
import numpy as np

from .config import (
    Config,
    ModelConfig,
    load_config_yaml,
    load_model_config_yaml,
)

logger = logging.getLogger("stylish_tts_tpu")


def _setup_jax_cache():
    """Persistent XLA compilation cache (shared impl: utils/jax_cache.py).
    Override dir with STYLISH_TPU_CACHE; disable with =0."""
    from .utils.jax_cache import setup_persistent_cache

    setup_persistent_cache(logger=logger)


def _load_configs(config_path, model_config_path, checkpoint=None):
    """Load configs; a checkpoint's own model_config.json wins over the
    YAML when present (it carries import provenance like
    imported_weights, reference train_context config registry parity)."""
    _setup_jax_cache()
    config = load_config_yaml(config_path) if config_path else Config()
    ckpt_mc = checkpoint and osp.join(checkpoint, "model_config.json")
    if ckpt_mc and osp.isfile(ckpt_mc):
        import json

        with open(ckpt_mc, "r", encoding="utf-8") as f:
            model_config = ModelConfig.model_validate(json.load(f))
    elif model_config_path:
        model_config = load_model_config_yaml(model_config_path)
    else:
        model_config = ModelConfig()
    return config, model_config


@click.group()
def train_cli():
    """stylish-train: TPU-native training toolkit."""


@train_cli.command("train-align")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--checkpoint", default=None, type=click.Path(exists=True))
def train_align(config_path, model_config_path, out_dir, checkpoint):
    """Alignment (CTC) pretraining; saves alignment_model.safetensors."""
    from .trainer.loop import Trainer

    config, model_config = _load_configs(config_path, model_config_path)
    trainer = Trainer(config, model_config, out_dir)
    trainer.train("alignment", checkpoint=checkpoint)


@train_cli.command("align")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option(
    "--method",
    type=click.Choice(["k2", "torch"], case_sensitive=False),
    default="k2",
    help="Duration attribution: 'k2' gives leading/trailing silence to "
    "the pad tokens (reference default, train/cli.py:130-133); 'torch' "
    "leaves blanks with the preceding token.",
)
def align(config_path, model_config_path, out_dir, method):
    """Generate the forced-alignment cache for both splits."""
    from .dataprep.align import calculate_alignments, write_alignment_outputs
    from .trainer.loop import Trainer
    from .utils.params_io import load_params_safetensors

    config, model_config = _load_configs(config_path, model_config_path)
    trainer = Trainer(config, model_config, out_dir)
    aligner_path = trainer.data_path(config.dataset.alignment_model_path)
    if not osp.isfile(aligner_path):
        raise click.ClickException(
            f"No alignment model at {aligner_path}; run train-align first."
        )
    params = load_params_safetensors(aligner_path)
    train_ds = trainer.build_dataset(config.dataset.train_data)
    val_ds = trainer.build_dataset(config.dataset.val_data)
    trainer.init_normalization(train_ds, out_dir)

    durations, confidences = {}, {}
    for split, ds in (("train", train_ds), ("val", val_ds)):
        durations[split], confidences[split] = calculate_alignments(
            ds, trainer.models["text_aligner"], params, model_config,
            trainer.normalization, method=method.lower(),
        )
    write_alignment_outputs(
        out_dir, trainer.data_path(config.dataset.alignment_path),
        durations, confidences,
    )
    click.echo(
        f"wrote alignments for "
        f"{sum(len(v) for v in durations.values())} segments"
    )


@train_cli.command("align-textgrid")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--segment", required=True, help="wav filename from the train list")
def align_textgrid(config_path, model_config_path, out_dir, segment):
    """Align one segment and write a Praat .TextGrid for inspection
    (reference: dataprep/align_textgrid.py:69-155)."""
    from .dataprep.align import calculate_alignments
    from .trainer.loop import Trainer
    from .utils.params_io import load_params_safetensors

    config, model_config = _load_configs(config_path, model_config_path)
    trainer = Trainer(config, model_config, out_dir)
    params = load_params_safetensors(
        trainer.data_path(config.dataset.alignment_model_path)
    )
    ds = trainer.build_dataset(config.dataset.train_data)
    trainer.init_normalization(ds, out_dir)
    target = [s for s in ds.segments if s.wav_path == segment]
    if not target:
        raise click.ClickException(f"segment {segment} not in train list")
    ds.segments = target
    durations, confidences = calculate_alignments(
        ds, trainer.models["text_aligner"], params, model_config,
        trainer.normalization,
    )
    durs = durations[segment][0]
    hop_s = model_config.hop_length / model_config.sample_rate
    phonemes = "$" + target[0].phonemes + "$"
    os.makedirs(out_dir, exist_ok=True)
    out_path = osp.join(out_dir, segment.replace(".wav", ".TextGrid"))
    _write_textgrid(out_path, phonemes, durs, hop_s)
    click.echo(
        f"wrote {out_path} (confidence {confidences[segment]:.3f})"
    )


def _write_textgrid(path, phonemes, durations, hop_seconds):
    total = float(durations.sum()) * hop_seconds
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {total:.6f}", "tiers? <exists>", "size = 1",
        "item []:", "    item [1]:", '        class = "IntervalTier"',
        '        name = "phones"', "        xmin = 0",
        f"        xmax = {total:.6f}",
        f"        intervals: size = {len(durations)}",
    ]
    t = 0.0
    for i, d in enumerate(durations):
        t2 = t + float(d) * hop_seconds
        ph = phonemes[i] if i < len(phonemes) else ""
        lines += [
            f"        intervals [{i + 1}]:",
            f"            xmin = {t:.6f}",
            f"            xmax = {t2:.6f}",
            f'            text = "{ph}"',
        ]
        t = t2
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


@train_cli.command("pitch")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--method", default="yin", type=click.Choice(["yin", "rmvpe"]),
              help="'yin' (on-device DSP, no weights needed) or 'rmvpe' "
                   "(NN estimator; reference pitch_extractor.py:44-58)")
@click.option("--rmvpe-weights", default=None, type=click.Path(exists=True),
              help="rmvpe.safetensors path (HF stylish-tts/pitch_extractor); "
                   "downloaded automatically when the hub is reachable")
def pitch(config_path, model_config_path, out_dir, method, rmvpe_weights):
    """Generate the pitch cache (batched YIN or RMVPE on the accelerator)."""
    from .data.caches import save_cache
    from .dataprep.pitch import extract_pitch_for_dataset
    from .trainer.loop import Trainer

    config, model_config = _load_configs(config_path, model_config_path)
    trainer = Trainer(config, model_config, out_dir)

    extractor = None
    if method == "rmvpe":
        from .dataprep.rmvpe import RMVPEPitchExtractor

        if rmvpe_weights is None:
            try:
                from huggingface_hub import hf_hub_download

                rmvpe_weights = hf_hub_download(
                    "stylish-tts/pitch_extractor", "rmvpe.safetensors"
                )
            except Exception as exc:
                raise click.ClickException(
                    f"--rmvpe-weights not given and hub download failed: {exc}"
                )
        extractor = RMVPEPitchExtractor(
            rmvpe_weights, model_config.sample_rate, model_config.hop_length
        )

    cache = {}
    for list_name in (config.dataset.train_data, config.dataset.val_data):
        ds = trainer.build_dataset(list_name)
        cache.update(
            extract_pitch_for_dataset(
                ds, model_config.hop_length, model_config.sample_rate,
                extractor=extractor,
            )
        )
    out_path = trainer.data_path(config.dataset.pitch_path)
    save_cache(out_path, cache)
    click.echo(f"wrote pitch for {len(cache)} segments to {out_path}")


@train_cli.command("slm-cache")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
def slm_cache(config_path, model_config_path, out_dir):
    """Precompute GT WavLM embeddings for the slm loss.

    Runs the frozen WavLM encoder over every training segment once and
    writes dataset.slm_path; acoustic training then matches predictions
    against the cache instead of re-embedding GT audio every step
    (half the slm compute, and the cache can be produced with the real
    pretrained weights on any machine that has them)."""
    from .dataprep.slm_cache import compute_slm_cache, write_slm_cache
    from .trainer.loop import Trainer, try_load_wavlm_params

    config, model_config = _load_configs(config_path, model_config_path)
    trainer = Trainer(config, model_config, out_dir)
    wavlm_params = try_load_wavlm_params(
        model_config.slm.model,
        allow_random_fallback=model_config.slm.allow_random_fallback,
    )
    cache = {}
    for list_name in (config.dataset.train_data, config.dataset.val_data):
        ds = trainer.build_dataset(list_name)
        cache.update(compute_slm_cache(ds, wavlm_params))
    out_path = trainer.data_path(config.dataset.slm_path)
    write_slm_cache(out_path, cache)
    click.echo(f"wrote slm embeddings for {len(cache)} segments to {out_path}")


@train_cli.command("train")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--stage", default="acoustic",
              type=click.Choice(["acoustic", "textual", "duration"]))
@click.option("--checkpoint", default=None, type=click.Path(exists=True))
@click.option("--reset-stage", is_flag=True, default=False)
@click.option("--profile", "profile_dir", default=None, type=click.Path(),
              help="capture a jax.profiler trace into this directory")
def train(config_path, model_config_path, out_dir, stage, checkpoint,
          reset_stage, profile_dir):
    """Main multi-stage training (acoustic -> textual -> duration)."""
    from .trainer.loop import Trainer

    config, model_config = _load_configs(config_path, model_config_path)
    trainer = Trainer(config, model_config, out_dir)
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            trainer.train(stage, checkpoint=checkpoint, reset_stage=reset_stage)
    else:
        trainer.train(stage, checkpoint=checkpoint, reset_stage=reset_stage)


@train_cli.command("dataset-from-audiobook")
@click.option("--audio", "audio_paths", required=True, multiple=True,
              type=click.Path(exists=True),
              help="narration wav file(s) or directory, in reading order")
@click.option("--book", "book_path", required=True, type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--sample-rate", default=24000)
@click.option("--val-fraction", default=0.05)
def dataset_from_audiobook(audio_paths, book_path, out_dir, sample_rate,
                           val_fraction):
    """Build an LJSpeech-style training dataset from audiobook narration:
    VAD-segment the audio, sentence-pack + phonemize the book text, pair
    in reading order (reference ttab dataset scripts counterpart)."""
    from .textproc.audiobook import prepare_dataset

    paths = []
    for p in audio_paths:
        if osp.isdir(p):
            paths.extend(
                osp.join(p, f) for f in sorted(os.listdir(p))
                if f.lower().endswith(".wav")
            )
        else:
            paths.append(p)
    with open(book_path, "r", encoding="utf-8") as f:
        book_text = f.read()
    os.makedirs(out_dir, exist_ok=True)
    n_train, n_val = prepare_dataset(
        paths, book_text, out_dir, sample_rate, val_fraction
    )
    click.echo(f"wrote {n_train} train / {n_val} val segments to {out_dir}")


@train_cli.command("import-torch")
@click.option("--config", "config_path", type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--checkpoint", required=True, type=click.Path(exists=True),
              help="Reference accelerate save_state checkpoint directory")
@click.option("--out", "out_dir", required=True, type=click.Path())
def import_torch(config_path, model_config_path, checkpoint, out_dir):
    """Import a trained PyTorch reference checkpoint (accelerate
    save_state dir) into this framework's checkpoint format.

    The imported model runs the exact reference function (BatchNorm
    folded to frozen affine, weight/spectral norm folded into kernels —
    see convert/): `convert`, `voicepack` and `speak` work on it
    directly, so reference users keep their trained models when
    switching."""
    import jax

    from .convert.checkpoint_import import import_torch_checkpoint
    from .trainer.checkpoint import Manifest, save_checkpoint
    from .trainer.normalization import NormalizationStats
    from .trainer.state import create_train_state

    config, model_config = _load_configs(config_path, model_config_path)
    params = import_torch_checkpoint(checkpoint, model_config)
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    state = create_train_state(params, model_config.text_encoder.tokens + 1)
    manifest = Manifest(stage="duration")  # fully-trained reference model
    os.makedirs(out_dir, exist_ok=True)
    path = save_checkpoint(
        out_dir, state, manifest, config, model_config, NormalizationStats()
    )
    click.echo(f"imported torch checkpoint -> {path}")


@train_cli.command("convert")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--checkpoint", required=True, type=click.Path(exists=True))
@click.option("--out", "out_dir", required=True, type=click.Path())
@click.option("--stablehlo", is_flag=True, default=False)
def convert(config_path, model_config_path, checkpoint, out_dir, stablehlo):
    """Package a checkpoint for inference (params + metadata
    [+ StableHLO graphs])."""
    import jax

    from .export.package import export_checkpoint
    from .trainer.checkpoint import load_checkpoint
    from .trainer.init import init_all_params
    from .trainer.loop import Trainer
    from .trainer.state import create_train_state

    config, model_config = _load_configs(
        config_path, model_config_path, checkpoint=checkpoint
    )
    trainer = Trainer(config, model_config, out_dir)
    params = init_all_params(trainer.models, model_config, jax.random.PRNGKey(0))
    abstract = create_train_state(params, model_config.text_encoder.tokens + 1)
    state, manifest, norm = load_checkpoint(checkpoint, abstract)

    # pitch stats over the cache (reference train/cli.py:358-364)
    pitch_log2_mean, pitch_log2_std = 7.0, 1.0
    pitch_path = trainer.data_path(config.dataset.pitch_path)
    if osp.isfile(pitch_path):
        from .data.caches import load_cache

        vals = []
        for arr in load_cache(pitch_path).values():
            arr = np.asarray(arr)
            vals.append(arr[arr > 10])
        allp = np.concatenate(vals) if vals else np.array([128.0])
        if allp.size:
            pitch_log2_mean = float(np.log2(allp).mean())
            pitch_log2_std = float(max(np.log2(allp).std(), 1e-6))

    # frames-per-token quantiles over the alignment cache so serving
    # warmup compiles the frame buckets real utterances hit
    duration_stats = None
    align_path = trainer.data_path(config.dataset.alignment_path)
    if osp.isfile(align_path):
        from .data.caches import load_cache
        from .export.package import duration_stats_from_cache

        duration_stats = duration_stats_from_cache(load_cache(align_path))

    export_checkpoint(
        state.params, model_config, norm, out_dir,
        pitch_log2_mean=pitch_log2_mean, pitch_log2_std=pitch_log2_std,
        emit_stablehlo=stablehlo, duration_stats=duration_stats,
    )
    click.echo(f"wrote inference package to {out_dir}")


@train_cli.command("voicepack")
@click.option("--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--model-config", "model_config_path", type=click.Path(exists=True))
@click.option("--checkpoint", required=True, type=click.Path(exists=True))
@click.option("--out", "out_path", required=True, type=click.Path())
@click.option("--dynamic", is_flag=True, default=False,
              help="per-segment styles + sentence-embedding kNN pack")
def voicepack(config_path, model_config_path, checkpoint, out_path, dynamic):
    """Encode training-set styles into a voicepack (static or dynamic)."""
    import jax

    from .trainer.checkpoint import load_checkpoint
    from .trainer.init import init_all_params
    from .trainer.loop import Trainer
    from .trainer.state import create_train_state
    from .tts.voicepack import (
        build_dynamic_pack,
        build_static_pack,
        encode_all_styles,
        save_dynamic_voicepack,
        save_static_voicepack,
    )

    config, model_config = _load_configs(
        config_path, model_config_path, checkpoint=checkpoint
    )
    trainer = Trainer(config, model_config, osp.dirname(out_path) or ".")
    params0 = init_all_params(trainer.models, model_config, jax.random.PRNGKey(0))
    abstract = create_train_state(params0, model_config.text_encoder.tokens + 1)
    state, _, norm = load_checkpoint(checkpoint, abstract)
    ds = trainer.build_dataset(config.dataset.train_data)
    styles = encode_all_styles(
        ds, trainer.models, state.params, norm, model_config
    )
    if dynamic:
        from .textproc.embed import get_embedder

        texts = [s.text for s in ds.segments]
        pack = build_dynamic_pack(styles, texts, get_embedder())
        save_dynamic_voicepack(out_path, pack)
    else:
        pack = build_static_pack(styles)
        save_static_voicepack(out_path, pack)
    click.echo(f"wrote voicepack ({styles['lengths'].shape[0]} segments)")


@click.group()
def tts_cli():
    """stylish-tts: synthesis from an inference package."""


@tts_cli.command("speak")
@click.option("--model", "package_dir", required=True, type=click.Path(exists=True))
@click.option("--voicepack", "voicepack_path", required=True,
              type=click.Path(exists=True))
@click.option("--text", "text_path", required=True, type=click.Path(exists=True),
              help="file of `phonemes` lines")
@click.option("--out", "out_path", required=True, type=click.Path())
@click.option("--speed", default=1.0, type=float)
def speak(package_dir, voicepack_path, text_path, out_path, speed):
    """Synthesize a document: one line per utterance, concatenated with
    -25 LUFS loudness normalization (reference tts/cli.py:32-96)."""
    from .data.wav import write_wav
    from .export.package import InferencePackage
    from .tts.loudness import normalize_loudness
    from .tts.voicepack import load_voicepack, lookup_static_style

    pkg = InferencePackage(package_dir)
    pack = load_voicepack(voicepack_path)
    embed = None
    if pack["kind"] == "dynamic":
        from .textproc.embed import get_embedder
        from .tts.voicepack import lookup_dynamic_style

        embed = get_embedder()
    pieces = []
    with open(text_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tokens = pkg.tokenize(line)
            if embed is not None:
                speech_s, pe_s, dur_s = lookup_dynamic_style(
                    pack, embed([line])[0]
                )
            else:
                speech_s, pe_s, dur_s = lookup_static_style(
                    pack, tokens.shape[0]
                )
            audio = pkg.generate_speech(
                tokens, speech_s, pe_s, dur_s, speed=speed
            )
            pieces.append(
                normalize_loudness(audio, pkg.mc.sample_rate)
            )
    full = np.concatenate(pieces) if pieces else np.zeros(1, np.float32)
    write_wav(out_path, full, pkg.mc.sample_rate)
    click.echo(
        f"wrote {out_path}: {full.shape[0] / pkg.mc.sample_rate:.2f}s "
        f"({len(pieces)} utterances)"
    )


@tts_cli.command("prepare-book")
@click.option("--text", "text_path", required=True, type=click.Path(exists=True))
@click.option("--out", "out_path", required=True, type=click.Path())
@click.option("--phonemize", "do_phonemize", is_flag=True, default=False,
              help="emit IPA phonemes (espeak when available)")
def prepare_book(text_path, out_path, do_phonemize):
    """Split long-form text into synthesis-sized utterances, one per
    line — ready for `speak` (reference ttab prepare_book pipeline)."""
    from .textproc.book import pack_utterances, split_chapters
    from .textproc.g2p import phonemize as g2p
    from .textproc.normalize import normalize_text

    with open(text_path, encoding="utf-8") as f:
        text = f.read()
    lines = []
    for chapter in split_chapters(text):
        sentences = [normalize_text(s) for s in chapter.sentences]
        for utt in pack_utterances(sentences):
            lines.append(g2p(utt) if do_phonemize else utt)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    click.echo(f"wrote {len(lines)} utterances to {out_path}")


if __name__ == "__main__":
    train_cli()
