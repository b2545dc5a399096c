"""Default config tree.

Key-compatible with the reference's ``configs/defaults.py:7-717`` (same
section names, key names, and default values) so reference YAML recipes and
``--opts`` overrides work unchanged, with two deliberate extensions:

1. **Restored nodes** the reference fork dropped even though its model code
   reads them (reference ``models/video_model_builder.py:222,666,812``,
   ``models/masked.py:28``, ``models/contrastive.py:185,810``): ``SLOWFAST``,
   ``X3D``, ``MASK``, ``MVIT.REV``, ``TRAIN.BATCH_SIZE``, ``NUM_SHARDS``,
   ``DATA.TRAIN_CROP_SIZE`` and friends. Here SlowFast/X3D/MaskMViT/
   reversible-MViT are first-class.
2. A new ``TPU`` section for mesh layout, on-device augmentation, and
   prefetch — capabilities with no reference equivalent.
"""

import math

from advise_tpu.config.node import CfgNode

_C = CfgNode()

# Number of accelerator devices to use (reference key name kept: NUM_GPUS).
_C.NUM_GPUS = 4

# Number of hosts/slices participating (restored reference key NUM_SHARDS,
# read by models/contrastive.py:185 in the reference).
_C.NUM_SHARDS = 1

_C.PIPELINE = ["train"]

_C.MODELDATA = None

_C.TASK = "tmodeling"

_C.LINEAR_PROBING = False

_C.RESUME = None

# -----------------------------------------------------------------------------
# TPU runtime options (new — no reference equivalent)
# -----------------------------------------------------------------------------
_C.TPU = CfgNode()

# Mesh axis sizes. 'data' is the pure data-parallel axis; 'sync' is the inner
# axis over which BatchNorm statistics are synchronized (maps the reference's
# BN.NUM_SYNC_DEVICES subgrouping to a mesh sub-axis). data*sync must equal
# the total device count. -1 means infer from jax.device_count().
_C.TPU.MESH_DATA = -1
_C.TPU.MESH_SYNC = 1
# sequence-parallel axis size (>1 adds a 'seq' mesh axis: eligible MViT
# attention blocks shard tokens and run ring attention over it — the
# pod-scale long-clip path, BASELINE.json config #5)
_C.TPU.MESH_SEQ = 1
# pipeline-parallel axis size (>1 adds an inner 'pipe' mesh axis:
# reversible-MViT uniform segments run GPipe-style — stage s holds
# blocks [s*L/P,(s+1)*L/P), microbatches stream between stages over ICI
# ppermute; parallel/pipeline.py). Batch is replicated along 'pipe'.
# Requires MVIT.REV.ENABLE on the shard_map path (MViT / MaskFeat-mode
# MaskMViT); every reversible segment's length must divide by it.
_C.TPU.MESH_PIPE = 1
# microbatches streamed through the pipe (0 = MESH_PIPE). More
# microbatches shrink the (P-1)/(M+P-1) fill bubble at the cost of
# smaller per-tick GEMMs; the per-device batch must divide by it.
_C.TPU.PIPE_MICROBATCH = 0

# Partitioning strategy for the train step.
#  'shard_map' (default): explicit SPMD — jit(shard_map(step)) over the
#     ('data','sync'[,'seq']) mesh with hand-placed collectives (grad
#     pmean, subgroup SyncBN psum, shuffle-BN, queue all_gather).
#  'auto': jit + GSPMD — the step is written over logically GLOBAL arrays;
#     params carry NamedShardings (tensor-parallel attention/MLP over a
#     'model' axis + optional FSDP over 'data') and XLA's partitioner
#     inserts all collectives. BN reduces over the global batch (implies
#     BN.GLOBAL_SYNC semantics); shuffle-BN is moot. This is the scale-out
#     path for the transformer flagships (Swin-B MoCo, MViT-L joint).
_C.TPU.PARTITION_MODE = "shard_map"
# tensor-parallel ('model') axis size for PARTITION_MODE='auto'
_C.TPU.MESH_MODEL = 1
# shard eligible replicated params over the 'data' axis too (ZeRO-3-style
# fully-sharded data parallelism; auto mode only)
_C.TPU.FSDP = False

# Run augmentation on device (fused XLA/Pallas kernels over batched uint8
# frames) instead of per-frame PIL on the host.
_C.TPU.DEVICE_AUG = True

# Number of batches to keep in flight host->device.
_C.TPU.PREFETCH = 2

# Compute dtype for model forward/backward ('float32' or 'bfloat16').
# Parameters and optimizer state always stay float32.
_C.TPU.COMPUTE_DTYPE = "bfloat16"

# Donate input state buffers to the train step (saves HBM).
_C.TPU.DONATE = True

# Use jax.checkpoint (rematerialization) on residual stages.
_C.TPU.REMAT = False

# Remat policy for the per-stage nn.remat scopes (TPU.REMAT=True):
#   ''           - default: save nothing, the backward replays each stage.
#   'block_outs' - jax.checkpoint_policies.save_only_these_names on the
#                  per-residual-block outputs tagged with
#                  jax.ad_checkpoint.checkpoint_name('block_out') in
#                  ResStage: the backward recomputes at most one residual
#                  block at a time instead of a whole stage (less
#                  recompute, slightly more live memory).
#   'dots'       - checkpoint_policies.dots_with_no_batch_dims_saveable
#                  (saves contraction results with no batch dims; mostly
#                  relevant for the transformer families).
_C.TPU.REMAT_POLICY = ""

# Remat scope granularity for the ResNet families (TPU.REMAT=True):
#   'stage' - one jax.checkpoint per ResStage (default). The backward
#             replays a whole stage, so ALL its internal activations are
#             simultaneously live at the replay point — the bs64 OOM
#             dump's dominant residents were exactly stage-s2's per-block
#             conv/relu outputs (8x784M at once, BASELINE round 4).
#   'block' - one jax.checkpoint per ResBlock: the backward replays one
#             residual block at a time (peak ~2 block activations), at
#             the cost of saving every block-boundary activation.
_C.TPU.REMAT_GRANULARITY = "stage"

# Pin stem conv outputs (and the TPU.FUSE_EMA_STEM fused conv output)
# behind jax.lax.optimization_barrier so XLA's HLO rematerialization pass
# cannot recompute them in the backward. Round-3 traces showed the fused
# stem conv running TWICE (fusion.3088 + its .remat twin = 56.5 ms/step,
# the 411 MB output recomputed under memory pressure) — this is the
# policy-level lever aimed at exactly that clone.
_C.TPU.STEM_BARRIER = False

# Emit the device-aug output in TPU.COMPUTE_DTYPE instead of float32.
# The cast happens INSIDE the per-clip lax.map body, so the serial map's
# [B*K,T,S,S,C] accumulator — the largest single step resident (616 MB
# f32 at the bs16 flagship, 2.46 GB at bs64) — materializes at half
# width. Bit-identical to the step's previous aug->astype(compute)
# sequence (normalize still computes in f32 per clip); standalone aug
# users (PIL golden tests) keep f32 with the knob off.
_C.TPU.AUG_COMPUTE_OUT = False

# Run multi-view SSL forwards (BYOL/SimCLR/SwAV online nets, momentum-
# encoder keys) as ONE vmapped batched program instead of sequential
# per-view forwards. BN statistics stay per-view (vmap keeps the view dim
# out of BN's reductions), matching the reference's sequential semantics;
# only the running-stat bookkeeping averages instead of chains. Measured
# 1.35x on the SlowFast-R50 BYOL step (scripts/bench_byol_parts.py).
_C.TPU.VMAP_VIEWS = True

# Use the Pallas fused-aug kernel for AUG.TYPE='simple' (crop+color+
# normalize in one VMEM pass, crop-window-only HBM reads) instead of the
# XLA lowering.
_C.TPU.PALLAS_AUG = False

# Route the 8-wide s2d fast stem through the column-packed Toeplitz
# Pallas kernel (ops/pallas/stem_conv.py): J=16 output positions x 8
# channels fill the MXU's 128 lanes where XLA's lowering fills 8
# (BASELINE.md r3 trace: stem fwd 23.9 ms x2 towers + wgrad 44.1 ms).
# Only eligible shapes route (F*16==128, W%16==0); others and non-TPU
# backends keep the XLA conv.
_C.TPU.PALLAS_STEM = False

# With PALLAS_STEM: keep the FORWARD on XLA's dense conv and use the
# Pallas kernel only for the weight gradient. The full-Pallas path
# materializes its ~1G padded-input buffer in the forward, which at bs32
# trips a residency-pressure rescheduling cliff (755.8 vs 692.1 ms,
# BASELINE.md r5) — wgrad-only moves the pack + kernel into the stem's
# backward, the tail of the step where activations are retired, keeping
# the 44.1->~10 ms weight-grad win without touching forward scheduling.
_C.TPU.PALLAS_STEM_WGRAD_ONLY = False

# With PALLAS_STEM: lax.scan the pack + kernel over batch chunks of this
# size in BOTH directions. The bs32 regression above is a scheduling
# cliff around the ~960 MB forward pack (AOT says both programs fit);
# chunking bounds the live pack to chunk/B of that while keeping the
# forward kernel's 29.9->15.8 ms win. 0 (default) = unchunked.
_C.TPU.PALLAS_STEM_CHUNK = 0

# Route MViT's rel-pos-free pooled-KV attention through the Pallas flash
# kernel (ops/flash_attention.py): scores stream through VMEM tiles
# instead of materializing [nq, nk] f32 tensors in HBM. Non-TPU backends
# fall back to the dense chain automatically (CPU mesh tests/dryrun).
_C.TPU.FLASH_ATTENTION = False

# With FLASH_ATTENTION on, keep blocks whose head_dim the kernel would
# have to zero-pad (>128 and not a 128-multiple — MViT's dim-doubling
# stages run 192-wide heads, padded to 256 = +33% matmul flops) on the
# dense path; only natively-supported head dims flash.
_C.TPU.FLASH_NATIVE_DIM_ONLY = False

# When set, capture a jax.profiler trace of training steps
# [PROFILE_START, PROFILE_START + PROFILE_STEPS) into this directory
# (the SURVEY §5 tracing subsystem; view with TensorBoard or Perfetto).
_C.TPU.PROFILE_DIR = ""
_C.TPU.PROFILE_START = 10
_C.TPU.PROFILE_STEPS = 5

# Compute the ResNet/SlowFast stem conv on a 2x2 space-to-depth input
# (lossless kernel remap, identical params/checkpoints). Targets the
# <2%-MXU-utilization narrow-channel stem the SlowFast BYOL device trace
# exposed (~24% of the step); needs even input H/W. Off by default until
# measured on the chip.
_C.TPU.STEM_S2D = False

# With STEM_S2D: route the fast-stem WEIGHT GRADIENT through a conv with
# output channels zero-padded to this width (custom_vjp; forward stays at
# the real width). Measured REFUTED as a step win on v5e (BASELINE.md
# round-3 stem endgame): the raw-conv wgrad is 3.6x faster padded
# (41.5 -> 11.4 ms) but through the module the win disappears (79.2 vs
# 78.6 ms fwd+wgrad) and the vmapped-views lowering regresses (93.5 ms).
# Kept as a tested knob for other XLA versions/chips; 0 (default) = off.
_C.TPU.STEM_PAD_OUT = 0

# BYOL + SlowFast + STEM_S2D: compute the ONLINE and EMA towers' stem
# convolutions as ONE channel-concatenated conv per pathway (the towers
# see identical inputs; conv output channels are independent, so slicing
# the concat is algebraically identical to two convs — step-level parity
# test). Standalone measurement: 61.7 vs 104.5 ms for separate towers —
# but IN-STEP the win is erased: XLA's rematerialization runs the fused
# conv TWICE (fwd + recompute in the backward; traced: fusion.3088 +
# .remat = 56.5 ms/step) and the weight-grad stays at ~43 ms, totaling
# ~100 ms vs the unfused 92 (full step 493 vs 483-498 variance). Third
# consistent result (with RA_BATCHED and STEM_PAD_OUT): step-level XLA
# scheduling — remat policy and BN-stat fusion — dominates isolated stem
# kernel choices on this toolchain. Off by default; measured write-up in
# BASELINE.md.
_C.TPU.FUSE_EMA_STEM = False

# Persistent XLA compilation cache directory ('' disables, the default).
# On real TPU backends serialized executables are reused across
# processes/restarts — multi-minute flagship-step compiles become
# near-instant on resume; set it for production deployments. Off by
# default because (a) backends without executable serialization (e.g.
# this image's axon relay) silently write nothing, and (b) XLA:CPU AOT
# reuse warns about machine-feature mismatches. Verified working on
# XLA:CPU (cache hit on second process).
_C.TPU.COMPILE_CACHE_DIR = ""

# -----------------------------------------------------------------------------
# TModeling options
# -----------------------------------------------------------------------------
_C.TM = CfgNode()

_C.TM.ENABLE_BF16 = False
_C.TM.SPATIAL_POOL_DIM = None
_C.TM.CHANNEL_POOL_DIM = None
_C.TM.TEMPORAL_ARCH = "conv3d"
_C.TM.NUM_BLOCKS = 4
_C.TM.NUM_HEADS = 6
_C.TM.SKIP_TM = False
_C.TM.FROM_SCRATCH = False
_C.TM.TEMPORAL_CAT = False
_C.TM.LINEAR_PROJ = False

# -----------------------------------------------------------------------------
# SSL options
# -----------------------------------------------------------------------------
_C.SSL = CfgNode()

_C.SSL.TASK = "speed"
_C.SSL.WEIGHT_OF_LOSS = [1.0]
_C.SSL.MARGIN = 0.5
_C.SSL.METHOD = "random"
_C.SSL.JITTER = 0.2
_C.SSL.RANGE = [1, 2, 4, 8]
_C.SSL.HEAD_L2_NORM = False
_C.SSL.NUM_MLP_LAYERS = 2
_C.SSL.MLP_DIM = 2048
_C.SSL.BN_MLP = True
_C.SSL.BN_SYNC_MLP = True
_C.SSL.STAT = ["loss_spd", "acc_spd"]
_C.SSL.METRIC = ["ce", "acc@1"]
_C.SSL.SMOOTHING = 0.0

# -----------------------------------------------------------------------------
# Contrastive model (MoCo, SimCLR, SwAV, BYOL, memory bank)
# -----------------------------------------------------------------------------
_C.CONTRASTIVE = CfgNode()

_C.CONTRASTIVE.T = 0.07
_C.CONTRASTIVE.DIM = 128
_C.CONTRASTIVE.HIDDEN_DIM = 4096
_C.CONTRASTIVE.LENGTH = 239975
_C.CONTRASTIVE.QUEUE_LEN = 65536
_C.CONTRASTIVE.MOMENTUM = 0.5
_C.CONTRASTIVE.MOMENTUM_ANNEALING = False
_C.CONTRASTIVE.TYPE = "mem"
_C.CONTRASTIVE.INTERP_MEMORY = False
_C.CONTRASTIVE.MEM_TYPE = "1d"
# time slots per memory row for MEM_TYPE '2d' (the reference carries the
# full 2D Memory machinery, contrastive.py:937-1040, but pins duration=1
# at :48; exposed here so the time-indexed bank is actually reachable)
_C.CONTRASTIVE.DURATION = 1
# surface-compat only (reference declares it; no reader there either)
_C.CONTRASTIVE.NUM_CLASSES_DOWNSTREAM = 400
_C.CONTRASTIVE.NUM_MLP_LAYERS = 2
_C.CONTRASTIVE.MLP_DIM = 2048
_C.CONTRASTIVE.BN_MLP = True
_C.CONTRASTIVE.BN_SYNC_MLP = True
_C.CONTRASTIVE.LOCAL_SHUFFLE_BN = True
_C.CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE = False
_C.CONTRASTIVE.DELTA_CLIPS_MIN = -math.inf
_C.CONTRASTIVE.DELTA_CLIPS_MAX = math.inf
_C.CONTRASTIVE.PREDICTOR_DEPTHS = []
_C.CONTRASTIVE.SEQUENTIAL = False
_C.CONTRASTIVE.SIMCLR_DIST_ON = True
_C.CONTRASTIVE.SWAV_QEUE_LEN = 0
_C.CONTRASTIVE.KNN_ON = True
# Online kNN monitor (reference init_knn_labels + eval_knn,
# models/contrastive.py:143-149,233-241): with KNN_ON, the trainer fills
# a label bank from the train dataset and probes kNN top-1 against the
# kNN feature memory at each epoch end over this many fresh train
# batches (0 disables the probe; the bank still updates).
_C.CONTRASTIVE.KNN_EVAL_BATCHES = 2
# similarity-weighted vote over the top-k neighbors (temperature follows
# CONTRASTIVE.T at probe time)
_C.CONTRASTIVE.KNN_K = 200
# probe with the batch's own BN statistics instead of eval-mode running
# stats (deviation knob, default off = reference eval_knn semantics):
# early in training the running stats are uncalibrated while the bank was
# written from train-mode features, so the eval-mode probe under-reads
_C.CONTRASTIVE.KNN_BATCH_STATS = False

# -----------------------------------------------------------------------------
# Training options
# -----------------------------------------------------------------------------
_C.TRAIN = CfgNode()

_C.TRAIN.LOG_FREQ = 20
# checkpoint every N epochs; <= 0 disables ALL checkpoint writes
# (incl. best) — bench/convergence-run affordance, engine/checkpoint.py
_C.TRAIN.SAVE_FREQ = 5
# N/A on TPU: mixed precision is the dtype policy (TPU.COMPUTE_DTYPE =
# bfloat16), not a torch autocast context (reference tools/train.py AMP).
_C.TRAIN.AMP = False
_C.TRAIN.SEED = 0
_C.TRAIN.RESUME = None
# fsspec URL mirror for checkpoints (the reference's s3:// smart_open
# checkpointing, utils/misc.py:311-349); e.g. gs://bucket/run1, memory://ck
_C.TRAIN.CHECKPOINT_REMOTE = None
_C.TRAIN.AUTO_RESUME = False
_C.TRAIN.SEQUENTIAL = False
# Restored: global batch size (reference models/contrastive.py:810 reads it).
# -1 = infer as DATA.BATCHSIZE_PER_GPU * NUM_GPUS * NUM_SHARDS.
_C.TRAIN.BATCH_SIZE = -1

# -----------------------------------------------------------------------------
# Test options (restored minimal node; reference reads
# cfg.TEST.CHECKPOINT_FILE_PATH in models/contrastive.py)
# -----------------------------------------------------------------------------
_C.TEST = CfgNode()

# Reference reads this only inside MaskMViT's offline visualization
# naming (masked.py:530); checkpoint loading here goes through
# TRAIN.RESUME / top-level RESUME (engine/checkpoint.py).
_C.TEST.CHECKPOINT_FILE_PATH = ""

# -----------------------------------------------------------------------------
# Inference options
# -----------------------------------------------------------------------------
_C.INFER = CfgNode()

_C.INFER.SAMPLE_METHOD = "uniform"
_C.INFER.NUM_CLIPS = 10
_C.INFER.NUM_CROPS = 3
_C.INFER.RES = 256
_C.INFER.NUM_FRAMES = 8
_C.INFER.STRIDE = 8
_C.INFER.JITTER = 0.0
_C.INFER.SEED = 0
_C.INFER.DATADIR = None
_C.INFER.LABELDIR = None
_C.INFER.SPLITFILE = None
_C.INFER.BATCHSIZE_PER_GPU = 1
_C.INFER.WORKERS = 8

# -----------------------------------------------------------------------------
# Validation options
# -----------------------------------------------------------------------------
_C.VAL = CfgNode()

_C.VAL.TARGET_SIZE = 224
_C.VAL.MIN_AREA = 0.08
_C.VAL.RAND_CROP_RATIO = (3.0 / 4.0, 4.0 / 3.0)
_C.VAL.NUM_FRAME = 8
_C.VAL.STRIDE = 1
_C.VAL.JITTER = 0.2
_C.VAL.RANGE = [1, 2, 4, 8]
_C.VAL.DATADIR = None
_C.VAL.LABELDIR = None
_C.VAL.SPLITFILE = None
_C.VAL.BATCHSIZE_PER_GPU = 2
_C.VAL.WORKERS = 8
# Frame rate assumed by the dense validation sampler. The reference hardcodes
# 25 fps (datasets/sampling.py:247) — kept configurable here (SURVEY §8.3).
_C.VAL.FPS = 25

# -----------------------------------------------------------------------------
# Solver options
# -----------------------------------------------------------------------------
_C.SOLVER = CfgNode()

_C.SOLVER.MAX_EPOCH = 100
_C.SOLVER.START_EPOCH = 0
_C.SOLVER.OPTIMIZING_METHOD = "sgd"
_C.SOLVER.BASE_LR = 1e-1
_C.SOLVER.NESTEROV = True
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.DAMPENING = 0.0
_C.SOLVER.WEIGHT_DECAY = 1e-6
_C.SOLVER.LR_POLICY = "cosine"
_C.SOLVER.COSINE_END_LR = 0.0
_C.SOLVER.WARMUP_EPOCHS = 10.0
_C.SOLVER.WARMUP_START_LR = 0.001
_C.SOLVER.COSINE_AFTER_WARMUP = False
_C.SOLVER.LAYER_DECAY = 1.0
_C.SOLVER.LARS_ON = False
_C.SOLVER.ZERO_WD_1D_PARAM = False
_C.SOLVER.STEPS = []
_C.SOLVER.LRS = []
_C.SOLVER.BETAS = (0.9, 0.999)
# Gradient clipping by global norm (0 = off). New key; the reference only
# *measures* grad norm (models/optimizer.py:375) but never clips.
_C.SOLVER.CLIP_GRAD_NORM = 0.0

# -----------------------------------------------------------------------------
# Augmentation options
# -----------------------------------------------------------------------------
_C.AUG = CfgNode()

_C.AUG.TYPE = "simple"
_C.AUG.RESIZE = [320, 256]
_C.AUG.TARGET_SIZE = 224
_C.AUG.COLOR = [0.8, 0.4, 0.4, 0.4, 0.2]
_C.AUG.GRAYSCALE = 0.2
_C.AUG.MIN_AREA = 0.08
_C.AUG.MAX_AREA = 0.76
_C.AUG.RAND_CROP_RATIO = (3.0 / 4.0, 4.0 / 3.0)
_C.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
# Documented deviation: the reference passes this to timm
# create_random_augment (datasets/__init__.py:66 — PIL resample of the
# RandAugment geometric ops); the device RandAugment here warps with
# bilinear taps always (data/rand_augment.py warp_affine). The RRC
# resample likewise follows jax.image 'linear'.
_C.AUG.INTERPOLATION = "bicubic"
_C.AUG.CAMERA_SHAKE = 0.0
_C.AUG.CAMERA_SHIFT = 0.0
_C.AUG.ZOOM = 0.0
_C.AUG.COLOR_BRI = 0.0
_C.AUG.COLOR_SAT = 0.0
_C.AUG.WHITE_BALANCE = 0.0
_C.AUG.COLOR_AREA_SCALE = (0.04, 0.16)
_C.AUG.SSL_BLUR_SIGMA_MIN = [0.0, 0.1]
_C.AUG.SSL_BLUR_SIGMA_MAX = [0.0, 2.0]
_C.AUG.RANDOM_FLIP = True
_C.AUG.INV_UNIFORM_SAMPLE = False
_C.AUG.TRAIN_JITTER_MOTION_SHIFT = False
# The reference's hue jitter is a silent no-op (uint8 truncation bug,
# augmentation.py:50-52 / SURVEY.md §8). True (default) reproduces that —
# and is 3x faster on TPU (skips the HSV roundtrip). False enables a real
# hue rotation at COLOR[4] strength.
_C.AUG.REFERENCE_EXACT_HUE = True
# Fused RandAugment fast path: compose RRC + sampled geometric ops + flip
# into one bilinear gather per clip (single resample; color ops applied
# post-warp in sampled order). False (default) = sequential op-exact PIL
# semantics, matching the repo convention that non-exact fast paths land
# off-by-default (cf. TPU.STEM_S2D, AUG.REFERENCE_EXACT_HUE); the perf
# presets enable it explicitly. See data/rand_augment.py
# make_fused_rand_augment for the semantics delta.
_C.AUG.FUSED_RA = False
# Batched slot-phase execution of the fused path: vmapped/flat-gather
# geometry + whole-batch color slots with a while-loop equalize.
# Bit-exact vs the per-clip fused path (parity-tested) but MEASURED
# SLOWER on v5e (BASELINE.md round-3 RA write-up): the batched warp
# gather lowers 3.3-6x worse than the serial lax.map (98.7/186.3 ms vs
# 30.2 ms at 32 clips), and once equalize got its nibble rewrite the
# serial color dispatch stopped being the bottleneck (full aa pipeline:
# serial 57 ms vs batched 205-306 ms). Kept off as a documented
# alternative execution mode; only applies with FUSED_RA.
_C.AUG.RA_BATCHED = False
# Random erasing (timm semantics; reference datasets/random_erasing.py).
_C.AUG.RE_PROB = 0.0
_C.AUG.RE_MODE = "pixel"
_C.AUG.RE_COUNT = 1
# Chunk width for the per-clip RandAugment dispatch map (1 = fully
# sequential lax.map). >1 vmaps chunks of clips: the color-op lax.switch
# then executes EVERY op on each chunk (more data traffic) but amortizes
# the per-clip dispatch latency the device trace showed (~100 ms/step
# serial at bs16; BASELINE.md). Tune per chip/batch; semantics identical.
_C.AUG.RA_MAP_BATCH = 1
# Masked-pretrain mask geometry (restored; reference models/masked.py reads
# cfg.AUG.MASK_RATIO / MASK_TUBE / MASK_FRAMES).
_C.AUG.MASK_RATIO = 0.75
_C.AUG.MASK_TUBE = False
_C.AUG.MASK_FRAMES = False
# Block-masking geometry for MaskFeat (reference datasets/transform.py
# MaskingGenerator3D usage).
_C.AUG.MAX_MASK_PATCHES_PER_BLOCK = None

# -----------------------------------------------------------------------------
# Data options
# -----------------------------------------------------------------------------
_C.DATA = CfgNode()

_C.DATA.DATASET = "ucf-101"
_C.DATA.DATADIR = None
_C.DATA.LABELDIR = None
_C.DATA.SPLITFILE = None
_C.DATA.NUM_CLIP = 4
# Dead in the reference: these size only the SimCLR pos/neg-mask
# machinery behind a hardcoded `distributed_loss = False`
# (contrastive.py:748-768) — the live branch is the 2-view gathered
# NT-Xent implemented here. DATA.NUM_CLIP is the crop count that runs.
_C.DATA.TRAIN_CROP_NUM_TEMPORAL = 4
_C.DATA.TRAIN_CROP_NUM_SPATIAL = 1
_C.DATA.NUM_FRAMES = 8
_C.DATA.STRIDE = 1
_C.DATA.BATCHSIZE_PER_GPU = 8
_C.DATA.WORKERS = 8
_C.DATA.INPUT_CHANNEL_NUM = [3]
# Restored keys (read by reference models/video_model_builder.py:803,
# datasets/utils.py, masked.py) that the fork dropped:
_C.DATA.TRAIN_CROP_SIZE = 224
_C.DATA.TEST_CROP_SIZE = 224
_C.DATA.MEAN = [0.485, 0.456, 0.406]
_C.DATA.STD = [0.229, 0.224, 0.225]
_C.DATA.RANDOM_FLIP = True
_C.DATA.REVERSE_INPUT_CHANNEL = False
_C.DATA.INV_UNIFORM_SAMPLE = False
_C.DATA.TRAIN_JITTER_SCALES_RELATIVE = []
_C.DATA.TRAIN_JITTER_ASPECT_RELATIVE = []
_C.DATA.TRAIN_JITTER_MOTION_SHIFT = False
# Decode backend: 'auto' | 'cv2' | 'tensor' | 'synthetic'.
_C.DATA.DECODE_BACKEND = "auto"
# For the synthetic backend: number of items and nominal video length.
_C.DATA.SYNTHETIC_SIZE = 64
_C.DATA.SYNTHETIC_LENGTH = 250
_C.DATA.SYNTHETIC_RES = 128
_C.DATA.SYNTHETIC_NUM_CLASSES = 101
# class-coded synthetic content: object colors derive from cls_id, so
# classes are visually separable (kNN / probe tests need a class signal)
_C.DATA.SYNTHETIC_CLASS_CODED = False
# Motion-strength multiplier of the synthetic videos (playback-speed
# signal strength for convergence benchmarks).
_C.DATA.SYNTHETIC_MOTION = 1.0

# -----------------------------------------------------------------------------
# ResNet options
# -----------------------------------------------------------------------------
_C.RESNET = CfgNode()

_C.RESNET.TRANS_FUNC = "bottleneck_transform"
_C.RESNET.NUM_GROUPS = 1
_C.RESNET.WIDTH_PER_GROUP = 64
# N/A under XLA: in-place activation is a torch memory detail; XLA's
# buffer assignment handles aliasing (reference resnet_helper relu inplace).
_C.RESNET.INPLACE_RELU = True
_C.RESNET.STRIDE_1X1 = False
_C.RESNET.ZERO_INIT_FINAL_BN = False
_C.RESNET.ZERO_INIT_FINAL_CONV = False
_C.RESNET.DEPTH = 50
_C.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3], [4], [6], [3]]
_C.RESNET.SPATIAL_STRIDES = [[1], [2], [2], [2]]
_C.RESNET.SPATIAL_DILATIONS = [[1], [1], [1], [1]]

# -----------------------------------------------------------------------------
# SlowFast options (restored — reference models/video_model_builder.py:222-418
# reads these but the fork dropped the node)
# -----------------------------------------------------------------------------
_C.SLOWFAST = CfgNode()

# Speed ratio between fast and slow pathways.
_C.SLOWFAST.ALPHA = 8
# Inverse channel ratio of the fast pathway.
_C.SLOWFAST.BETA_INV = 8
# Channel ratio of the fast-to-slow fusion conv.
_C.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
# Temporal kernel size of the fusion conv.
_C.SLOWFAST.FUSION_KERNEL_SZ = 7

# -----------------------------------------------------------------------------
# X3D options (restored — reference models/video_model_builder.py:641-784)
# -----------------------------------------------------------------------------
_C.X3D = CfgNode()

_C.X3D.WIDTH_FACTOR = 1.0
_C.X3D.DEPTH_FACTOR = 1.0
_C.X3D.BOTTLENECK_FACTOR = 2.25
_C.X3D.DIM_C1 = 12
_C.X3D.DIM_C5 = 2048
_C.X3D.SCALE_RES2 = False
_C.X3D.BN_LIN5 = False
_C.X3D.CHANNELWISE_3x3x3 = True

# -----------------------------------------------------------------------------
# Masked prediction options (restored — reference models/masked.py:24-658)
# -----------------------------------------------------------------------------
_C.MASK = CfgNode()

_C.MASK.ENABLE = False
_C.MASK.MAE_ON = False
# The reference's block-mask alternative is UNREACHABLE in its fork: the
# datasets never instantiate MaskingGenerator(3D) (dead since the
# PySlowFast split), so mask=None reaches _mae_random_masking and only
# the random path runs — which is what this build implements
# (models/masked.py random_masking; block-mask generators are available
# as library code in data/masking.py).
_C.MASK.MAE_RND_MASK = False
_C.MASK.PER_FRAME_MASKING = False
_C.MASK.TIME_STRIDE_LOSS = True
_C.MASK.NORM_PRED_PIXEL = True
# fix_init_weight-style depth-scaled init (reference masked.py:130):
# attn-proj / fc2 weights divided by sqrt(2*layer_id).
_C.MASK.SCALE_INIT_BY_DEPTH = False
_C.MASK.DECODER_EMBED_DIM = 512
_C.MASK.DECODER_DEPTH = 0
_C.MASK.DECODER_SEP_POS_EMBED = False
_C.MASK.DEC_KV_KERNEL = []
_C.MASK.DEC_KV_STRIDE = []
_C.MASK.PRETRAIN_DEPTH = [15]
_C.MASK.HEAD_TYPE = "separate"
_C.MASK.PRED_HOG = False
_C.MASK.PRED_HOG_NBINS = 9
_C.MASK.PRED_HOG_CELL_SZ = 8
# Masking ratio / block geometry for the pretrain mask generator.
_C.MASK.MASK_RATIO = 0.75
_C.MASK.MAX_MASK_PATCHES_PER_BLOCK = None
# joint contrastive+masked pretrain (BASELINE.json config #5): adds an
# NT-Xent term between the two views' pooled projections to the masked loss
_C.MASK.JOINT_CONTRASTIVE = False
_C.MASK.JOINT_WEIGHT = 0.5

# -----------------------------------------------------------------------------
# Mask visualization (restored; reference models/masked.py reads
# cfg.VIS_MASK.ENABLE)
# -----------------------------------------------------------------------------
_C.VIS_MASK = CfgNode()

_C.VIS_MASK.ENABLE = False

# -----------------------------------------------------------------------------
# Model options
# -----------------------------------------------------------------------------
_C.MODEL = CfgNode()

_C.MODEL.MODEL_NAME = "ResNet"
_C.MODEL.ARCH = "Slow"
_C.MODEL.NUM_CLASSES = 5
_C.MODEL.DROPOUT_RATE = 0.0
_C.MODEL.DETACH_FINAL_FC = False
# N/A under XLA: the DDP fp16 gradient-compression hook (reference
# models/build.py:84-87) has no analog — grads reduce inside the jitted
# step; use bf16 compute for the equivalent bandwidth saving.
_C.MODEL.FP16_ALLREDUCE = False
_C.MODEL.ACT_CHECKPOINT = False
_C.MODEL.FC_INIT_STD = 0.01
_C.MODEL.HEAD_ACT = "softmax"
_C.MODEL.SPATIAL_MODEL_PATH = ""
_C.MODEL.SPATIAL_MODEL_ARCH = ""
_C.MODEL.SPATIAL_EMBEDDING_DIM = 768
_C.MODEL.TEMPORAL_NUM_LAYERS = 6
_C.MODEL.TEMPORAL_NUM_HEADS = 8
_C.MODEL.TEMPORAL_EMBEDDING_DIM = 512
_C.MODEL.TEMPORAL_HIDDEN_DIM = 256
_C.MODEL.TEMPORAL_NUM_EMBEDDINGS = 8
# Loss function name for supervised/action tasks.
# Dead in the reference too: losses are selected via SSL.METRIC in the
# output handlers (reference tools/train.py:96-109); _LOSSES never reads
# this key outside a commented assert (contrastive.py:63).
_C.MODEL.LOSS_FUNC = "cross_entropy"
# Drop-connect rate for X3D blocks (restored; reference
# models/video_model_builder.py:759 reads it).
_C.MODEL.DROPCONNECT_RATE = 0.0

# -----------------------------------------------------------------------------
# Batch norm options
# -----------------------------------------------------------------------------
_C.BN = CfgNode()

_C.BN.GLOBAL_SYNC = False
_C.BN.NUM_SYNC_DEVICES = 4
_C.BN.NORM_TYPE = "sync_batchnorm"
_C.BN.WEIGHT_DECAY = 0.0
# SubBatchNorm split count (reference models/batchnorm_helper.py:44).
_C.BN.NUM_SPLITS = 1

# -----------------------------------------------------------------------------
# Detection options (vestigial in the reference; kept for config parity)
# -----------------------------------------------------------------------------
_C.DETECTION = CfgNode()

_C.DETECTION.ENABLE = False

# -----------------------------------------------------------------------------
# Nonlocal options
# -----------------------------------------------------------------------------
_C.NONLOCAL = CfgNode()

_C.NONLOCAL.LOCATION = [[[]], [[]], [[]], [[]]]
_C.NONLOCAL.GROUP = [[1], [1], [1], [1]]
_C.NONLOCAL.INSTANTIATION = "dot_product"
_C.NONLOCAL.POOL = [
    [[1, 2, 2], [1, 2, 2]],
    [[1, 2, 2], [1, 2, 2]],
    [[1, 2, 2], [1, 2, 2]],
    [[1, 2, 2], [1, 2, 2]],
]

# -----------------------------------------------------------------------------
# MViT options
# -----------------------------------------------------------------------------
_C.MVIT = CfgNode()

_C.MVIT.MODE = "conv"
_C.MVIT.POOL_FIRST = False
_C.MVIT.CLS_EMBED_ON = True
_C.MVIT.PATCH_KERNEL = [3, 7, 7]
_C.MVIT.PATCH_STRIDE = [2, 4, 4]
_C.MVIT.PATCH_PADDING = [2, 4, 4]
_C.MVIT.PATCH_2D = False
_C.MVIT.EMBED_DIM = 96
_C.MVIT.NUM_HEADS = 1
_C.MVIT.MLP_RATIO = 4.0
_C.MVIT.QKV_BIAS = True
_C.MVIT.DROPPATH_RATE = 0.1
_C.MVIT.LAYER_SCALE_INIT_VALUE = 0.0
_C.MVIT.DEPTH = 16
_C.MVIT.NORM = "layernorm"
_C.MVIT.DIM_MUL = []
_C.MVIT.HEAD_MUL = []
_C.MVIT.POOL_KV_STRIDE = []
_C.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
_C.MVIT.POOL_Q_STRIDE = []
_C.MVIT.POOL_KVQ_KERNEL = None
_C.MVIT.ZERO_DECAY_POS_CLS = True
_C.MVIT.NORM_STEM = False
_C.MVIT.SEP_POS_EMBED = False
_C.MVIT.DROPOUT_RATE = 0.0
_C.MVIT.USE_ABS_POS = True
_C.MVIT.REL_POS_SPATIAL = False
_C.MVIT.REL_POS_TEMPORAL = False
_C.MVIT.REL_POS_ZERO_INIT = False
_C.MVIT.RESIDUAL_POOLING = False
_C.MVIT.DIM_MUL_IN_ATT = False
_C.MVIT.SEPARATE_QKV = False
_C.MVIT.HEAD_INIT_SCALE = 1.0
_C.MVIT.USE_MEAN_POOLING = False
_C.MVIT.USE_FIXED_SINCOS_POS = False
# TPU-only: shard attention tokens over the 'seq' mesh axis (ring
# attention) for blocks whose token count is >= SEQ_SHARD_MIN_TOKENS;
# requires CLS_EMBED_ON=False and no rel-pos. Needs TPU.MESH_SEQ > 1.
_C.MVIT.SEQ_SHARD = False
_C.MVIT.SEQ_SHARD_MIN_TOKENS = 4096

# Reversible MViT (restored — reference models/reversible_mvit.py needs
# cfg.MVIT.REV.* which the fork dropped).
_C.MVIT.REV = CfgNode()

_C.MVIT.REV.ENABLE = False
_C.MVIT.REV.RESPATH_FUSE = "concat"
_C.MVIT.REV.BUFFER_LAYERS = []
_C.MVIT.REV.RES_PATH = "conv"
_C.MVIT.REV.PRE_Q_FUSION = "avg"
# TPU-only: True = O(1)-memory custom-VJP reversible scan over uniform
# segments; False = same coupling under plain autodiff (gradient oracle)
_C.MVIT.REV.O1_SCAN = True

# -----------------------------------------------------------------------------
# Video Swin options (the reference hardcodes these as SwinTransformer3D
# constructor defaults, models/swin_transformer.py:452-498; a yacs node is
# needed here so presets like Swin-B are config-drivable)
# -----------------------------------------------------------------------------
_C.SWIN = CfgNode()

_C.SWIN.PATCH_SIZE = [2, 4, 4]
_C.SWIN.EMBED_DIM = 96
_C.SWIN.DEPTHS = [2, 2, 6, 2]
_C.SWIN.NUM_HEADS = [3, 6, 12, 24]
_C.SWIN.WINDOW_SIZE = [2, 7, 7]
_C.SWIN.MLP_RATIO = 4.0
_C.SWIN.DROP_PATH_RATE = 0.1

# -----------------------------------------------------------------------------
# Multigrid training options (kept for config parity; not wired in reference)
# -----------------------------------------------------------------------------
_C.MULTIGRID = CfgNode()

_C.MULTIGRID.EPOCH_FACTOR = 1.5
_C.MULTIGRID.SHORT_CYCLE = False
_C.MULTIGRID.SHORT_CYCLE_FACTORS = [0.5, 0.707]
_C.MULTIGRID.LONG_CYCLE = False
_C.MULTIGRID.LONG_CYCLE_FACTORS = [
    [0.25, 0.707],
    [0.5, 0.707],
    [0.5, 1],
    [1, 1],
]
_C.MULTIGRID.BN_BASE_SIZE = 8
_C.MULTIGRID.EVAL_FREQ = 3
_C.MULTIGRID.LONG_CYCLE_SAMPLING_RATE = 0
_C.MULTIGRID.DEFAULT_B = 0
_C.MULTIGRID.DEFAULT_T = 0
_C.MULTIGRID.DEFAULT_S = 0


def assert_and_infer_cfg(cfg: CfgNode) -> CfgNode:
    """Validate and derive fields (reference configs/defaults.py:704-717,
    extended with mesh/batch inference)."""
    assert cfg.RESNET.NUM_GROUPS > 0
    assert cfg.RESNET.WIDTH_PER_GROUP > 0
    assert cfg.RESNET.WIDTH_PER_GROUP % cfg.RESNET.NUM_GROUPS == 0

    if cfg.TRAIN.BATCH_SIZE == -1:
        # PER-SHARD batch, matching the reference's semantics exactly:
        # every reference reader multiplies by NUM_SHARDS to go global
        # (contrastive.py:810,1101) — inferring the global value here
        # would double-count NUM_SHARDS in those checks
        cfg.TRAIN.BATCH_SIZE = cfg.DATA.BATCHSIZE_PER_GPU * cfg.NUM_GPUS

    assert cfg.TPU.COMPUTE_DTYPE in ("float32", "bfloat16")
    assert cfg.TPU.PARTITION_MODE in ("shard_map", "auto")
    if cfg.TPU.PARTITION_MODE == "auto":
        # GSPMD mode: XLA places collectives; the explicit-axes machinery
        # (subgroup SyncBN, shuffle-BN, ring attention) is shard_map-only
        assert cfg.TPU.MESH_SEQ in (1, None), (
            "TPU.MESH_SEQ (ring attention) requires PARTITION_MODE "
            "'shard_map'; auto mode shards tokens via GSPMD instead"
        )
    else:
        assert cfg.TPU.MESH_MODEL in (1, None) and not cfg.TPU.FSDP, (
            "TPU.MESH_MODEL/FSDP (tensor/fully-sharded parallelism) "
            "require TPU.PARTITION_MODE 'auto'"
        )
    if int(cfg.TPU.MESH_PIPE or 1) > 1:
        # pipeline parallelism (parallel/pipeline.py) pipelines the
        # reversible segments; reject unsupported combinations loudly
        assert cfg.TPU.PARTITION_MODE == "shard_map", (
            "TPU.MESH_PIPE requires PARTITION_MODE 'shard_map' (the pipe "
            "schedule is explicit ppermute SPMD); in auto mode use "
            "TPU.MESH_MODEL/FSDP instead"
        )
        assert cfg.MVIT.REV.ENABLE, (
            "TPU.MESH_PIPE pipelines the reversible-MViT uniform "
            "segments — set MVIT.REV.ENABLE=True (MViT or MaskFeat-mode "
            "MaskMViT)"
        )
        assert cfg.MODEL.MODEL_NAME in ("MViT", "MaskMViT"), (
            f"TPU.MESH_PIPE supports MViT/MaskMViT, not "
            f"{cfg.MODEL.MODEL_NAME}"
        )
        assert not (cfg.MODEL.MODEL_NAME == "MaskMViT" and cfg.MASK.MAE_ON), (
            "TPU.MESH_PIPE: the MAE branch builds non-reversible blocks "
            "(reference masked.py MAE path); use the MaskFeat branch or "
            "MESH_PIPE=1"
        )
        assert int(cfg.TPU.MESH_SEQ or 1) == 1, (
            "TPU.MESH_PIPE and TPU.MESH_SEQ are mutually exclusive for "
            "now (ring attention shards tokens inside the blocks the "
            "pipe schedule streams)"
        )
    if cfg.TASK == "speed":
        # the speed step's backward loss is metrics['loss_spd'] BY NAME
        # (engine/steps.py speed_task_loss, mirroring the reference
        # output_handler lookup tools/train.py:147-156) — reject a STAT
        # list without it here instead of a KeyError mid-trace
        assert "loss_spd" in cfg.SSL.STAT, (
            "TASK=speed needs 'loss_spd' in SSL.STAT (the named "
            "backward loss); got SSL.STAT={}".format(list(cfg.SSL.STAT))
        )
    if cfg.CONTRASTIVE.SEQUENTIAL:
        # per-clip micro-batching (reference contrastive_forward
        # :1120-1167) is implemented for the EMA-key algorithms on the
        # shard_map path; reject loudly rather than silently ignoring
        assert cfg.CONTRASTIVE.TYPE in ("byol", "moco"), (
            "CONTRASTIVE.SEQUENTIAL supports byol/moco only"
        )
        assert cfg.TPU.PARTITION_MODE == "shard_map", (
            "CONTRASTIVE.SEQUENTIAL is a shard_map-path memory lever; "
            "use TPU.REMAT / TPU.FSDP in auto mode"
        )
    assert cfg.BN.NORM_TYPE in (
        "batchnorm",
        "sub_batchnorm",
        "sync_batchnorm",
    )
    if cfg.BN.GLOBAL_SYNC:
        assert cfg.BN.NUM_SYNC_DEVICES in (None, -1), (
            "BN.GLOBAL_SYNC requires NUM_SYNC_DEVICES unset"
        )

    # ---- restored-knob validations (round-4 dead-knob audit) ----
    # reference reversible_mvit.py:57-59 / head_helper.py:491 /
    # video_model_builder.py:840: only layernorm is implemented
    assert cfg.MVIT.NORM == "layernorm", (
        f"MVIT.NORM={cfg.MVIT.NORM!r}: the reference (and this rebuild) "
        "only implements 'layernorm'"
    )
    if cfg.TPU.FLASH_ATTENTION and (
        cfg.MVIT.REL_POS_SPATIAL or cfg.MVIT.REL_POS_TEMPORAL
    ):
        # flash attention cannot fold the decomposed rel-pos bias into
        # its streaming softmax (the bias is recomputed per score tile
        # from q — models/layers/attention.py add_rel_pos_*), so those
        # blocks run dense. Say so loudly instead of silently ignoring
        # the knob (project loud-knob standard).
        import logging as _logging

        _logging.getLogger(__name__).warning(
            "TPU.FLASH_ATTENTION=True but MVIT.REL_POS_SPATIAL/TEMPORAL "
            "is on: rel-pos attention blocks are flash-INELIGIBLE and "
            "run the dense path (flash applies only to rel-pos-free "
            "blocks). Disable rel-pos or expect no flash speedup."
        )
    if cfg.MVIT.REV.ENABLE:
        assert cfg.MVIT.REV.RES_PATH in ("conv", "max"), (
            f"MVIT.REV.RES_PATH={cfg.MVIT.REV.RES_PATH!r} (reference "
            "reversible_mvit.py:343-355: conv|max)"
        )
        assert "concat" not in cfg.MVIT.REV.PRE_Q_FUSION, (
            "MVIT.REV.PRE_Q_FUSION 'concat*' modes double the stage-"
            "transition input dim (reference reversible_mvit.py:89-97 "
            "input_mult machinery) — not supported here; use one of the "
            "elementwise TwoStreamFusion modes (add/max/min/avg)"
        )
    if cfg.MODEL.MODEL_NAME == "MaskMViT":
        if cfg.MASK.MAE_ON:
            # the MAE visible-token gather needs a static keep count;
            # blockwise loader masks (MAE_RND_MASK=False) are not
            # exact-count and would make the program shape-dynamic
            assert cfg.MASK.MAE_RND_MASK, (
                "MASK.MAE_ON requires MASK.MAE_RND_MASK=True (random "
                "masking); blockwise loader masks have data-dependent "
                "keep counts, unjittable for the MAE gather"
            )
        if cfg.VIS_MASK.ENABLE:
            # the reference's visualization lives in the MAE forward
            # (masked.py:464-525); the JOINT head repurposes the extra
            # output slot
            assert cfg.MASK.MAE_ON and not cfg.MASK.JOINT_CONTRASTIVE, (
                "VIS_MASK.ENABLE needs MASK.MAE_ON (reference "
                "masked.py:464) and is exclusive with JOINT_CONTRASTIVE"
            )
        # reference video_model_builder.py:803: MViT assumes equal
        # train/test crops
        assert cfg.DATA.TRAIN_CROP_SIZE == cfg.DATA.TEST_CROP_SIZE, (
            "MViT requires DATA.TRAIN_CROP_SIZE == DATA.TEST_CROP_SIZE "
            "(reference video_model_builder.py:803)"
        )
        # the device aug emits AUG.TARGET_SIZE crops while the MViT token
        # geometry derives from DATA.TRAIN_CROP_SIZE — a mismatch is a
        # silent shape bug (caught in the r4 MViT-L AOT certification)
        assert cfg.DATA.TRAIN_CROP_SIZE == cfg.AUG.TARGET_SIZE, (
            f"DATA.TRAIN_CROP_SIZE={cfg.DATA.TRAIN_CROP_SIZE} != "
            f"AUG.TARGET_SIZE={cfg.AUG.TARGET_SIZE}: the masked-MViT "
            "token grid reads TRAIN_CROP_SIZE but clips arrive at "
            "TARGET_SIZE"
        )
    # reference video_model_builder.py:228,480,720 feeds
    # DATA.INPUT_CHANNEL_NUM as the stems' dim_in; the channel-last
    # ingest here is RGB (cv2 decode) so anything but 3 is a config error
    assert all(c == 3 for c in cfg.DATA.INPUT_CHANNEL_NUM), (
        f"DATA.INPUT_CHANNEL_NUM={cfg.DATA.INPUT_CHANNEL_NUM}: the "
        "decode/ingest pipeline is RGB (C=3)"
    )
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        # DATA.TRAIN_CROP_NUM_TEMPORAL/SPATIAL feed only the SimCLR
        # multi-crop positive-mask precompute (reference contrastive.py
        # :56-58, :806-845) — whose consuming branch is DEAD: the
        # reference hardcodes `distributed_loss = False` at :748, so its
        # live simclr path is exactly the 2-view cat_across_gpus NT-Xent
        # implemented here. The keys therefore stay unconstrained, as in
        # the reference (waived in scripts/scan_dead_knobs.py).
        # reference contrastive.py:1099-1105: the MoCo queue length must
        # divide evenly into global key batches (TRAIN.BATCH_SIZE is the
        # per-shard batch there; global = BATCH_SIZE * NUM_SHARDS)
        if cfg.CONTRASTIVE.TYPE == "moco" and cfg.TRAIN.BATCH_SIZE > 0:
            gb = cfg.TRAIN.BATCH_SIZE * max(cfg.NUM_SHARDS, 1)
            assert cfg.CONTRASTIVE.QUEUE_LEN % gb == 0, (
                f"CONTRASTIVE.QUEUE_LEN={cfg.CONTRASTIVE.QUEUE_LEN} must "
                f"be a multiple of the global batch {gb} (reference "
                "contrastive.py:1099-1105)"
            )
    return cfg


def get_cfg() -> CfgNode:
    """Get a copy of the default config."""
    return _C.clone()
