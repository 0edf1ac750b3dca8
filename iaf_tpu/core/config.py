"""Config system: a typed, flat hyperparameter container with a ``k=v,...``
string parser kept CLI-compatible with the reference's ``--hpconfig``.

Reference parity: ``tf_utils/hparams.py — class HParams`` (attr store with
``parse("a=1,b=0.5,c=true")`` and type inference from defaults) plus the
default hyperparameters in ``tf_train.py — get_default_hparams()``.
(Reference mount was empty at survey time; symbols cited per SURVEY.md §0.)

TPU-native deltas: the config is a frozen dataclass (hashable, so it can be a
static argument to ``jax.jit``), and adds mesh/precision knobs the reference
never had (``num_hosts`` towers -> ``mesh_data``/``mesh_model`` axes).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any


def _parse_value(raw: str, default: Any) -> Any:
    """Parse ``raw`` using the type of ``default`` (HParams-style inference)."""
    if isinstance(default, bool):
        low = raw.strip().lower()
        if low in ("true", "1", "yes"):
            return True
        if low in ("false", "0", "no"):
            return False
        raise ValueError(f"cannot parse {raw!r} as bool")
    if isinstance(default, int) and not isinstance(default, bool):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    if isinstance(default, str):
        return raw
    if isinstance(default, tuple):
        if raw.strip() == "":
            return ()
        elem = default[0] if default else 0
        return tuple(_parse_value(p, elem) for p in raw.split(";"))
    raise TypeError(f"unsupported config field type {type(default)}")


@dataclass(frozen=True)
class Config:
    """All hyperparameters of the IAF-VAE stack (TF + Theano capability union).

    Field names follow ``tf_train.get_default_hparams()`` where a counterpart
    exists so that reference reproduction commands like
    ``--hpconfig depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32``
    parse unchanged.
    """

    # --- data / problem ---
    dataset: str = "cifar10"          # cifar10 | mnist | synthetic
    data_dir: str = "./data"
    image_size: int = 32
    channels: int = 3

    # --- model architecture (tf_train.py CVAE1 defaults) ---
    z_size: int = 32                  # latent channels per stochastic layer
    h_size: int = 160                 # deterministic width
    depth: int = 2                    # IAF layers per block
    num_blocks: int = 2               # blocks of stochastic layers
    k: int = 1                        # importance samples (eval uses >1)
    kl_min: float = 0.25              # free bits per z-channel (0 disables)
    # AR posterior: number/width of hidden masked-conv layers in ar_multiconv2d
    depth_ar: int = 2                 # hidden masked conv layers ("[h_size]*depth_ar")
    ar_hidden_size: int = 0           # 0 -> use h_size
    flow: str = "iaf"                 # iaf | diag (diag = no flow, config c1)
    # IAF update parameterization: "division" (TF stack: z=(z-m)/exp(s)) or
    # "gate" (Theano stack: z = sigmoid(s)*z + (1-sigmoid(s))*m)
    flow_update: str = "division"
    gate_forget_bias: float = 1.0     # added to s before sigmoid in gate mode
    ar_kind: str = "conv"             # conv | dense (dense = MNIST MADE path)
    flow_depth: int = 2               # IAF steps for the vector-latent model
    kernel_size: int = 3              # AR/resnet conv filter size
    stem_kernel_size: int = 5         # stride-2 stem conv/deconv filter size
    # Data-dependent init scale for the stats convs (up_conv1/down_conv1):
    # posterior/prior logsd heads start near 0 so sigma ~ 1 at init. Raw
    # unit-variance logsd activations give exp() tails that compound across
    # stacked stochastic layers into f32 overflow (PixelCNN++-style 0.1).
    stat_init_scale: float = 0.1

    # --- objective / likelihood ---
    likelihood: str = "dlogistic"     # dlogistic | bernoulli (MNIST)
    binarize: bool = False            # dynamic binarization (MNIST path)

    # --- optimization (tf_utils/adamax.py + tf_train.py) ---
    learning_rate: float = 0.002
    beta1: float = 0.9
    beta2: float = 0.999
    adamax_eps: float = 1e-8
    bias_correction: bool = False     # upstream adamax.py applies none
    polyak_decay: float = 0.999       # tf.train.ExponentialMovingAverage decay
    grad_clip: float = 0.0            # 0 = off (reference has none)
    # Sequential micro-batches per optimizer step (lax.scan): activation
    # memory shrinks A-fold, so paper-scale global batches fit fewer chips.
    grad_accum: int = 1
    # GLOBAL batch (split across the mesh's data axis like the reference's
    # tf.split across towers). NOTE: upstream batch_size was PER-GPU, so a
    # reference command with batch_size=B on N GPUs needs batch_size=B*N
    # here for the same effective batch (README "Reproduction").
    batch_size: int = 16
    total_steps: int = 1_000_000
    seed: int = 123
    # Steps fused into one device program via lax.scan (1 = step-per-dispatch).
    # Collapses the per-step host->device hop; key discipline keeps chunked
    # and unchunked trajectories bit-identical. log/ckpt/eval cadences are
    # rounded to chunk boundaries. On a remote-tunneled TPU each host sync
    # costs a ~29 ms round trip, so size chunks to your log cadence: the r5
    # interleaved sweep measured 34.8/37.0/37.8/38.2/38.4 steps/s at
    # S=10/25/50/100/200 (paper config, v5e) — S=100 is within ~1% of the
    # device-bound asymptote.
    steps_per_dispatch: int = 1

    # lax.scan ONE compiled layer body over the stacked per-layer params
    # (params["blocks"], leading dim L) instead of unrolling L copies.
    # Either way the params stay STACKED (~25 large optimizer leaves instead
    # of 428 tiny ones); the flag only picks the execution form, with
    # identical math, keys, and trajectories. Measured on TPU (interleaved
    # A/B, paper config): scan 23.6 vs unroll 31.0 steps/s at batch 32 and
    # 10.12 vs 13.06 at batch 128 — the ~23% carry-serialization penalty is
    # batch-independent, so unrolled is the perf default; scan remains the
    # choice for compile-time- or memory-constrained runs (pairs with
    # remat).
    scan_blocks: bool = False
    # Unrolled form only: pre-fold weight normalization over the stacked
    # block params once per step (W = V/||V||*g batched over all L layers —
    # one reduction per leaf type instead of L tiny ones; AR masks still
    # apply after, exactly, since masks are 0/1). Same math to float
    # reduction order; see nn/layers.py fold_wn_tree. Honest interleaved
    # A/B (tools/ab_bench.py r4, v5e): 35.97 vs 31.50 steps/s (+14%,
    # ahead 4/4 rounds) -> default ON. NOTE: silently a no-op under
    # scan_blocks=true (the scan consumes the stacked V/g/b directly, so
    # there is nothing to pre-fold; leaving this True there changes
    # nothing).
    fold_wn: bool = True
    # Rematerialize the per-layer bodies in backward (jax.checkpoint on the
    # scan body): activation memory ~L-fold smaller for ~1/3 more FLOPs.
    # Only applies when scan_blocks=true.
    remat: bool = False
    # Pin every train-state leaf to the DEFAULT device layout at the jit
    # boundary (parallel/train_step.py _state_boundary_sharding). Under
    # AUTO layout assignment XLA round-trips several stacked param/opt
    # leaves through a cin-minor layout every step (10 full-leaf f32
    # relayout copies on the paper config, r5 HLO audit) purely to feed
    # the default-layout fused optimizer and restore donation aliasing.
    # Pinning removes the copies (r5 HLO: 11 -> 3 large relayouts) but
    # LOST its honest interleaved A/B 36.07 vs 36.42 steps/s, 6/6 rounds:
    # AUTO's cin-minor choice minimizes HBM lane-padding on the
    # [.,192,160]/[.,160,64] leaf families (1.33x vs 1.6x, 1.6x vs 2.0x
    # padded bytes), and the optimizer's 9 HBM passes over those leaves
    # outweigh the copies. Default OFF by measurement; the layout-aware
    # fused-optimizer admission below captures the same insight instead.
    # Pure layout choice — zero numerics impact either way.
    pin_state_layouts: bool = False
    # Keep stacked leaves whose AUTO device layout is non-default (last two
    # dims swapped to minimize tile padding — optim._auto_prefers_swapped)
    # on the XLA optimizer update instead of the default-layout-only Pallas
    # kernel, avoiding XLA's per-step relayout copies around the kernel.
    # Identical math either way (the XLA twin IS the oracle).
    fused_opt_layout_aware: bool = True

    # --- precision / kernels ---
    # Conv/matmul inputs are cast to this dtype (params, accumulations, and
    # all elementwise/likelihood numerics stay f32 — see nn/layers.py).
    # bfloat16 is the TPU perf default: +7% steps/s in the honest interleaved
    # A/B (tools/ab_bench.py r2: 33.15 vs 30.94 on the paper config) and the
    # bf16 trajectory tracks f32 within 2% on the shallow golden
    # (tests/test_golden.py::test_bf16_compute_tracks_f32). Pin
    # compute_dtype=float32 to reproduce the reference's exact f32 recipe.
    compute_dtype: str = "bfloat16"
    # Pallas kernel selection: "auto" admits only op classes that have WON
    # a measured A/B vs their XLA twin on TPU (ops/__init__.py _AUTO_WINS);
    # "pallas" forces everything (interpret mode off-TPU); "xla" forces the
    # twins; "pallas_ar"/"pallas_opt" isolate one kernel class for A/Bs.
    kernels: str = "auto"
    # Fused AR-stack kernel variant (only read when that kernel runs, i.e.
    # kernels=pallas/pallas_ar): "pertap" = r2 per-tap matmuls; "im2col" =
    # r4 live-tap-im2col challenger (one [rows, T*cin] x [T*cin, cout]
    # matmul per conv over the concatenated nonzero taps).
    ar_variant: str = "pertap"
    # Slice zero kernel rows off masked AR convs (asymmetric padding).
    # Exact-equivalent, 1/3 fewer AR-conv FLOPs; honest interleaved A/B
    # (tools/ab_bench.py): 36.8 vs 35.0 steps/s (+5%) on v5e -> default ON.
    ar_row_trim: bool = True
    # Compute the IAF (m, s) heads in one conv over concatenated masks
    # instead of two z_size-wide convs (identical math, fewer padded MXU
    # lanes). Honest A/B: 37.4 vs 36.9 steps/s (+1.4%) -> default ON.
    merge_ar_heads: bool = True

    # --- parallelism (new; reference had in-graph DP towers only) ---
    num_gpus: int = 1                 # reference flag kept for CLI parity (= data shards)
    mesh_data: int = 0                # 0 -> all devices on the data axis
    mesh_model: int = 1               # reserved model axis (off by default)

    # --- eval ---
    eval_batch_size: int = 16
    eval_k: int = 4096                # importance samples for IW eval
    # Importance samples materialized per shard at once (k streamed via an
    # online-logsumexp scan): bounds eval HBM at B*eval_k_chunk model widths.
    eval_k_chunk: int = 64

    # --- checkpoint / logging ---
    logdir: str = "/tmp/iaf_tpu"
    ckpt_every: int = 1000
    ckpt_keep: int = 5                # newest N kept (Saver max_to_keep=5); 0=all
    log_every: int = 100
    eval_every: int = 0               # 0 = off
    fail_after_step: int = 0          # fault injection: crash after N steps (0=off)
    tensorboard: bool = False         # also mirror metrics to TB event files
    # Sample/recon tiles on the in-train eval cadence (reference img_tile TB
    # summaries); written to logdir/images/*.npy + the TB mirror.
    image_summaries: bool = True

    # ------------------------------------------------------------------
    def parse(self, spec: str) -> "Config":
        """Return a new Config with ``k=v,...`` overrides applied.

        Mirrors ``HParams.parse``: types inferred from the defaults, unknown
        keys are an error.
        """
        if not spec:
            return self
        by_name = {f.name: f for f in fields(self)}
        updates: dict[str, Any] = {}
        for item in spec.split(","):
            item = item.strip()
            if not item:
                continue
            if "=" not in item:
                raise ValueError(f"malformed hpconfig item {item!r} (need k=v)")
            key, raw = item.split("=", 1)
            key = key.strip()
            if key not in by_name:
                raise KeyError(f"unknown hyperparameter {key!r}")
            updates[key] = _parse_value(raw, getattr(self, key))
        return dataclasses.replace(self, **updates)

    def __post_init__(self):
        # The kernel switch feeds A/B methodology (_AUTO_WINS admission);
        # a typo silently measuring XLA-vs-XLA must be impossible.
        legal = ("auto", "pallas", "xla", "pallas_ar", "pallas_opt",
                 "pallas_elem")
        if self.kernels not in legal:
            raise ValueError(f"kernels={self.kernels!r} not in {legal}")
        if self.ar_variant not in ("pertap", "im2col"):
            raise ValueError(f"ar_variant={self.ar_variant!r} not in "
                             "('pertap', 'im2col')")
        # The conv AR path adds the h_size-wide context (up_context +
        # down_context, tf_train.py IAFLayer) to the FIRST hidden masked
        # conv's output, so conv AR hidden widths must equal h_size
        # (upstream hardcodes n_h=[h_size]*2). The dense MNIST path
        # projects context per layer and takes any width.
        if (self.flow == "iaf" and self.ar_kind == "conv"
                and self.depth_ar > 0
                and self.ar_hidden_size not in (0, self.h_size)):
            raise ValueError(
                f"ar_hidden_size={self.ar_hidden_size} != h_size="
                f"{self.h_size}: conv AR hidden width is fixed to h_size "
                "by the context add (set ar_hidden_size=0, or use "
                "ar_kind=dense)")
        # With no hidden layer, the conv AR chain has nowhere to add the
        # context (it is added after hidden conv 0, tf_train.py parity) —
        # the heads would silently ignore up/down context and train a
        # degraded posterior. No-flow runs use flow=diag instead.
        if (self.flow == "iaf" and self.ar_kind == "conv"
                and self.depth_ar == 0):
            raise ValueError(
                "depth_ar=0 with the conv AR path would silently drop the "
                "up/down context from the posterior flow; use flow=diag "
                "for a no-flow model or depth_ar>=1")

    # Convenience accessors -------------------------------------------------
    @property
    def ar_hidden(self) -> int:
        return self.ar_hidden_size or self.h_size

    @property
    def num_pixels(self) -> int:
        return self.image_size * self.image_size * self.channels

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def get_default_hparams() -> Config:
    """Reference-named constructor (``tf_train.get_default_hparams()``)."""
    return Config()


HPS_FILENAME = "hps.json"


def save_hparams(cfg: Config, logdir: str) -> str:
    """Persist the resolved config to ``logdir/hps.json`` so later eval/
    sample/invert invocations reproduce the training architecture without
    re-passing ``--hpconfig`` (the reference required repeating it)."""
    import json
    import os

    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, HPS_FILENAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic, same discipline as checkpoints
    return path


def load_hparams(logdir: str) -> Config | None:
    """Config from ``logdir/hps.json``, or None if absent. Unknown keys
    (written by a newer version) are skipped with a warning; list values
    re-tuple-ified (JSON has no tuples)."""
    import json
    import os

    path = os.path.join(logdir, HPS_FILENAME)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    known = {f.name for f in fields(Config)}
    updates = {}
    for k, v in raw.items():
        if k not in known:
            print(f"[config] ignoring unknown saved hyperparameter {k!r}")
            continue
        updates[k] = tuple(v) if isinstance(v, list) else v
    return Config(**updates)


def resolve_config(logdir: str, hpconfig: str, mode: str = "train") -> Config:
    """Driver-side config resolution: saved ``hps.json`` in ``logdir`` (if
    any) as the base, then ``--hpconfig`` overrides, then ``logdir`` itself.
    (Pure — no JAX backend touch, so multi-host ``jax.distributed``
    bootstrap order is preserved; ``train_lib.train`` writes hps.json.)"""
    del mode
    base = load_hparams(logdir)
    return (base if base is not None else get_default_hparams()).parse(
        hpconfig).replace(logdir=logdir)
