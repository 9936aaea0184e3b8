"""Configuration system (yacs-compatible surface over typed defaults).

Replaces detectron2's ``get_cfg()`` + model-zoo YAML merge (reference
notebook cell 20; key reads at reference data_utils.py:158,169-173). The
returned CfgNode supports attribute access/assignment, ``merge_from_file``
with the model-zoo name 'COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x
.yaml' (mapped onto built-in defaults), ``clone``, and ``dump``.

Default values mirror detectron2's Base-RCNN-FPN + the 3x Mask R-CNN recipe
so that AP-parity comparisons are apples-to-apples.
"""
from __future__ import annotations

import copy
import json


class CfgNode(dict):
    """Dict with attribute access; nested dicts become CfgNodes."""

    def __init__(self, init=None):
        super().__init__()
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other):
        for k, v in other.items():
            if (k in self and isinstance(self[k], CfgNode)
                    and isinstance(v, dict)):
                self[k].merge_from_other_cfg(v)
            else:
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def merge_from_file(self, cfg_filename, allow_unsafe=False):
        name = str(cfg_filename)
        if "mask_rcnn_R_50_FPN" in name or "Base-RCNN-FPN" in name:
            # model-zoo config: our defaults already encode it; apply the
            # 3x-schedule specifics
            self.SOLVER.STEPS = (210000, 250000)
            self.SOLVER.MAX_ITER = 270000
            return
        with open(name) as f:
            text = f.read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            data = _parse_simple_yaml(text)
        self.merge_from_other_cfg(data)

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0
        for key, value in zip(opts[::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            if isinstance(value, str) and old is not None \
                    and not isinstance(old, str):
                value = type(old)(json.loads(value)) \
                    if not isinstance(old, bool) else value.lower() == "true"
            node[parts[-1]] = value

    def dump(self, **_kwargs):
        return json.dumps(self, indent=2, default=str)

    def freeze(self):  # API compat; configs stay mutable
        return self

    def defrost(self):
        return self


def _parse_simple_yaml(text):
    """Tiny YAML subset parser (flat/nested scalar maps) for user configs."""
    root: dict = {}
    stack = [(-1, root)]
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        indent = len(line) - len(line.lstrip())
        key, _, value = line.strip().partition(":")
        value = value.strip()
        while stack and indent <= stack[-1][0]:
            stack.pop()
        parent = stack[-1][1] if stack else root
        if not value:
            child: dict = {}
            parent[key] = child
            stack.append((indent, child))
        else:
            try:
                parent[key] = json.loads(value)
            except json.JSONDecodeError:
                parent[key] = value
    return root


def get_cfg() -> CfgNode:
    """Default config: Mask R-CNN R50-FPN (detectron2-compatible keys)."""
    c = CfgNode()

    c.VERSION = 2
    c.OUTPUT_DIR = "./output"
    c.SEED = -1

    c.MODEL = CfgNode()
    c.MODEL.DEVICE = "tpu"
    c.MODEL.WEIGHTS = ""
    c.MODEL.MASK_ON = True
    c.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    c.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]  # BGR, caffe-style
    c.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]

    c.MODEL.BACKBONE = CfgNode()
    c.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    c.MODEL.BACKBONE.FREEZE_AT = 2
    # Orbax checkpoint from tools/pretrain_backbone.py: graft its
    # pretrained ResNet subtree over the fresh init (the in-environment
    # stand-in for the reference's COCO transfer learning,
    # GETTING_STARTED.md:30). Ignored when MODEL.WEIGHTS is set.
    c.MODEL.BACKBONE.WEIGHTS = ""

    c.MODEL.RESNETS = CfgNode()
    c.MODEL.RESNETS.DEPTH = 50
    c.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    c.MODEL.RESNETS.NUM_GROUPS = 1
    c.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    c.MODEL.RESNETS.STRIDE_IN_1X1 = True
    c.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    c.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    c.MODEL.RESNETS.NORM = "FrozenBN"

    c.MODEL.FPN = CfgNode()
    c.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    c.MODEL.FPN.OUT_CHANNELS = 256
    c.MODEL.FPN.FUSE_TYPE = "sum"

    c.MODEL.ANCHOR_GENERATOR = CfgNode()
    c.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    c.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    c.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

    c.MODEL.RPN = CfgNode()
    c.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    c.MODEL.RPN.IOU_THRESHOLDS = [0.3, 0.7]
    c.MODEL.RPN.IOU_LABELS = [0, -1, 1]
    c.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    c.MODEL.RPN.POSITIVE_FRACTION = 0.5
    c.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    c.MODEL.RPN.SMOOTH_L1_BETA = 0.0
    c.MODEL.RPN.LOSS_WEIGHT = 1.0
    c.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 2000
    c.MODEL.RPN.PRE_NMS_TOPK_TEST = 1000
    c.MODEL.RPN.POST_NMS_TOPK_TRAIN = 1000
    c.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    c.MODEL.RPN.NMS_THRESH = 0.7
    c.MODEL.RPN.BOUNDARY_THRESH = -1

    c.MODEL.ROI_HEADS = CfgNode()
    c.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    c.MODEL.ROI_HEADS.NUM_CLASSES = 80
    c.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    c.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    c.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    c.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    c.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    c.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5

    c.MODEL.ROI_BOX_HEAD = CfgNode()
    c.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    c.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
    c.MODEL.ROI_BOX_HEAD.NUM_CONV = 0
    c.MODEL.ROI_BOX_HEAD.CONV_DIM = 256
    c.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    c.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    c.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
    c.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA = 0.0
    c.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False

    c.MODEL.ROI_MASK_HEAD = CfgNode()
    c.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    c.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    c.MODEL.ROI_MASK_HEAD.CONV_DIM = 256
    c.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    # auxiliary mask boundary loss (arXiv:1809.07069 "edge agreement"):
    # weight for an L2 loss between Sobel edge maps of the predicted mask
    # probabilities and of the GT mask. 0 = off (detectron2 parity);
    # sharpens boundaries / speeds mask convergence when training from
    # scratch.
    c.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT = 0.0
    c.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 0
    c.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = False

    c.MODEL.PROPOSAL_GENERATOR = CfgNode()
    c.MODEL.PROPOSAL_GENERATOR.NAME = "RPN"

    c.INPUT = CfgNode()
    c.INPUT.MIN_SIZE_TRAIN = (640, 672, 704, 736, 768, 800)
    c.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    c.INPUT.MAX_SIZE_TRAIN = 1333
    c.INPUT.MIN_SIZE_TEST = 800
    c.INPUT.MAX_SIZE_TEST = 1333
    c.INPUT.RANDOM_FLIP = "horizontal"
    # Photometric train augmentation (detectron2 T.RandomBrightness /
    # T.RandomContrast semantics: img*w and blend-with-mean respectively,
    # w ~ U[min, max] per image). Identity ranges = off (the detectron2
    # default; the reference never enables them). Applied in-graph inside
    # the jitted train step, so the device-resident sample cache
    # (TPU.DEVICE_DATA_CACHE_MB) is unaffected — recommended for
    # from-scratch training where augmentation matters most.
    c.INPUT.RANDOM_BRIGHTNESS = (1.0, 1.0)
    c.INPUT.RANDOM_CONTRAST = (1.0, 1.0)
    # Rotation train augmentation: a tuple of angles in degrees, one drawn
    # uniformly per sample (include 0 to keep unrotated variants), e.g.
    # (0, -30, 30). Applied host-side in the RAW frame (image via PIL
    # bilinear, polygon/RLE annotations analytically) with the frame kept
    # fixed (corners clip, detectron2 RandomRotation expand=False
    # semantics). Off by default (the reference never rotates). SEM
    # micrographs are orientation-free — recommended for from-scratch
    # training. Each angle multiplies the device sample-cache variants.
    c.INPUT.RANDOM_ROTATION = ()
    # Instance copy-paste train augmentation (Ghiasi et al. 2021, "Simple
    # Copy-Paste is a Strong Data Augmentation Method for Instance
    # Segmentation"): with probability COPY_PASTE per sample variant,
    # paste 1..COPY_PASTE_MAX instances from other training images at
    # random positions (each rescaled by a factor drawn from
    # COPY_PASTE_SCALE), removing occluded pixels from existing ground
    # truth. Host-side in the RAW frame. The paste layout is a pure
    # function of the sample-cache key (image, scale, flip/rotation code),
    # so it adds NO new cache variants — each existing variant gets one
    # fixed, distinct arrangement. Off by default (the reference's
    # detectron2 recipe has no copy-paste); the strongest lever this
    # framework has for its few-shot (<= 10 images) target regime.
    c.INPUT.COPY_PASTE = 0.0
    c.INPUT.COPY_PASTE_MAX = 20
    c.INPUT.COPY_PASTE_SCALE = (1.0, 1.0)
    # Crop training: sample one fixed (CROP_SIZE x CROP_SIZE) window per
    # cache variant at native scale before resizing (0 = off). Turns a
    # handful of large micrographs into hundreds of distinct effective
    # training views and lets small instances train at higher relative
    # resolution (pair with MIN_SIZE_TRAIN near CROP_SIZE for native-res
    # training). Inference is unaffected (full images).
    c.INPUT.CROP_SIZE = 0
    c.INPUT.MASK_FORMAT = "polygon"
    c.INPUT.FORMAT = "BGR"
    # TPU-specific: fixed padded canvas (h, w) for static shapes under jit;
    # None -> derived per dataset from the resize config, rounded up to /32.
    c.INPUT.FIXED_SIZE = None

    c.DATASETS = CfgNode()
    c.DATASETS.TRAIN = ()
    c.DATASETS.TEST = ()

    c.DATALOADER = CfgNode()
    c.DATALOADER.NUM_WORKERS = 4
    c.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True

    c.SOLVER = CfgNode()
    c.SOLVER.IMS_PER_BATCH = 16
    c.SOLVER.BASE_LR = 0.02
    c.SOLVER.MOMENTUM = 0.9
    c.SOLVER.WEIGHT_DECAY = 0.0001
    c.SOLVER.WEIGHT_DECAY_NORM = 0.0
    c.SOLVER.GAMMA = 0.1
    c.SOLVER.STEPS = (60000, 80000)
    c.SOLVER.MAX_ITER = 90000
    c.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    c.SOLVER.WARMUP_ITERS = 1000
    c.SOLVER.WARMUP_METHOD = "linear"
    c.SOLVER.CHECKPOINT_PERIOD = 5000
    c.SOLVER.CLIP_GRADIENTS = CfgNode(
        {"ENABLED": False, "CLIP_TYPE": "value", "CLIP_VALUE": 1.0,
         "NORM_TYPE": 2.0})
    # Exponential moving average of the weights (0 = off). When set (e.g.
    # 0.999), the trainer maintains EMA shadow params updated in the jitted
    # train step with TF-style warmup d_t = min(EMA_DECAY, (1+t)/(10+t)),
    # checkpoints them alongside the raw params, and checkpoint loading for
    # inference prefers them (engine.checkpoint.load_weights). The raw
    # params keep driving the optimization and the validation-loss hook.
    # Not a detectron2 knob — an own-framework option for from-scratch
    # few-shot training, where late-iterate averaging is a cheap AP gain.
    c.SOLVER.EMA_DECAY = 0.0
    c.SOLVER.AMP = CfgNode({"ENABLED": True})  # bf16 compute on TPU

    c.TEST = CfgNode()
    c.TEST.DETECTIONS_PER_IMAGE = 100
    c.TEST.EVAL_PERIOD = 0
    # maskness rescoring (SOLOv2 §3.3): score *= maskness**alpha, where
    # maskness is the mean foreground probability of the 28x28 soft mask.
    # 0 = off (detectron2 behavior). Applied host-side in DefaultPredictor.
    c.TEST.MASKNESS_RESCORE = 0.0

    # TPU / parallelism knobs (no detectron2 equivalent)
    c.TPU = CfgNode()
    c.TPU.MESH_SHAPE = None          # e.g. [8] for 8-way data parallel
    c.TPU.MESH_AXES = ("data",)
    c.TPU.USE_PALLAS = True          # True: pallas on TPU backends;
    #                                  False: portable path everywhere;
    #                                  "force": pallas even off-TPU
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    # int8 quantization of the mask-head convs + deconv at inference
    # (ops.quant; the v5e MXU runs int8 at 2x the bf16 rate). Modes:
    # False | "static" (recommended: calibrated scales, the predictor
    # auto-calibrates on its first batch) | True/"dynamic" (per-tensor
    # amax scales — measured slower than bf16 end-to-end on v5e).
    # Off by default: ~0.5% logit error — check mask AP on your dataset
    # before enabling (see docs/performance.md for the powder numbers).
    c.TPU.INT8_MASK_HEAD = False
    # int8 quantization of the res2-res5 backbone stages at inference
    # (models.resnet Bottleneck: FrozenBN folded into the quantized
    # kernels; activations cross HBM as int8 — the backbone is
    # bandwidth-bound). False | "static" (calibrated scales; the
    # predictor auto-calibrates alongside INT8_MASK_HEAD) | "calib".
    # FrozenBN models only. Check mask AP on your dataset before
    # enabling (docs/performance.md).
    c.TPU.INT8_BACKBONE = False
    # int8 for the FPN lateral/output convs + RPN head (same modes; with
    # INT8_BACKBONE the laterals consume the backbone's int8 outputs
    # directly).
    c.TPU.INT8_NECK = False
    # inference mask-stage capacity per image (models.mask_rcnn
    # MaskRCNN.mask_capacity_per_image): > 0 pools + mask-heads only the
    # batch's top-(B*capacity) detection slots instead of all
    # B*DETECTIONS_PER_IMAGE — identical outputs unless a batch carries
    # more valid detections than capacity (overflow -> empty masks for
    # the lowest-score detections, counted in the output's
    # "mask_dropped"). 0 = off (exact at any density).
    c.TPU.MASK_CAPACITY_PER_IMAGE = 0
    # per-instance GT mask crop canvas (T, T): ~60x less host->device
    # traffic than dense (G, H, W) mask stacks; instances larger than
    # T - 2 px are downscaled to fit (see ops.roi_align). 0 = dense path.
    c.TPU.MASK_CANVAS = 128
    # device-resident training-data cache cap (engine.device_cache):
    # each (image, scale-jitter size, flip) variant is uploaded once and
    # batches assemble on-device — zero steady-state host->device data
    # traffic (and a workaround for remote-transport clients that leak
    # the transferred bytes per upload). 0 disables (stream every batch).
    # 5120 covers the full rotation x scale x flip x copy-paste powder
    # recipe including pseudo-labeled tiles (540 variants x ~7.7 MB);
    # overflow falls back to a host-side materialization cache +
    # per-draw upload (measured: multi-second iteration stalls while
    # overflow variants re-upload, vs ~0.1 s cached).
    c.TPU.DEVICE_DATA_CACHE_MB = 5120

    return c


def model_zoo_get_config_file(name: str) -> str:
    """detectron2.model_zoo.get_config_file equivalent: returns the name;
    merge_from_file understands model-zoo names directly."""
    return name
