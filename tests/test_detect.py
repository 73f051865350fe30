"""Face detection + FAN landmark tests.

Forward parity runs against the REFERENCE's own torch RetinaFace
(/root/reference/swap_face_fine/gpen/face_detect/) with random torch weights
pushed through convert_retinaface — the strongest converter test available
without released checkpoints (a transposed-axis or misnamed mapping fails
here). torchvision is absent in this environment; the only symbol the
reference needs from it (IntermediateLayerGetter) is stubbed with the
documented torchvision semantics.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.fan import FAN, heatmaps_to_landmarks
from e4s2024_tpu.models.retinaface import (
    CFG_MNET,
    RetinaFace,
    decode_boxes,
    decode_landms,
    generate_priors,
)
from e4s2024_tpu.pipelines.detect import (
    DetectorConfig,
    FaceLandmarkDetector,
    FANLandmarker,
    RetinaFaceDetector,
    nms_fixed,
    pairwise_iou,
)

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_torchvision_stub():
    """Delegate to the shared superset stub (tests/_ref_compat.py) so suite
    ordering can't leave a narrower torchvision in sys.modules for the other
    parity tests (resnet/alexnet/vgg16 consumers)."""
    from tests import _ref_compat

    _ref_compat.install_torchvision_stub()


@pytest.fixture(scope="module")
def ref_retinaface():
    _install_torchvision_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from swap_face_fine.gpen.face_detect.facemodels.retinaface import (
        RetinaFace as TorchRetinaFace,
    )

    cfg = {
        "name": "mobilenet0.25",
        "min_sizes": [[16, 32], [64, 128], [256, 512]],
        "steps": [8, 16, 32],
        "variance": [0.1, 0.2],
        "clip": False,
        "pretrain": False,
        "return_layers": {"stage1": 1, "stage2": 2, "stage3": 3},
        "in_channel": 32,
        "out_channel": 64,
    }
    torch.manual_seed(0)
    net = TorchRetinaFace(cfg=cfg, phase="test").eval()
    # randomize BN stats too (fresh BN has mean 0 / var 1 — too easy)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.slow
def test_retinaface_forward_parity_vs_reference(ref_retinaface):
    """Flax forward (RGB in) must match the reference torch forward (BGR+mean
    in) after convert_retinaface."""
    from e4s2024_tpu.convert.torch_loader import convert_retinaface

    sd = {k: v.detach().numpy() for k, v in
          ref_retinaface.state_dict().items()}
    params = convert_retinaface(sd, CFG_MNET)

    rng = np.random.default_rng(0)
    rgb = (rng.random((1, 96, 96, 3)) * 255).astype(np.float32)
    # reference preprocessing (retinaface_detection.py:72-74): BGR - mean
    bgr = rgb[..., ::-1] - np.array([104, 117, 123], np.float32)
    with torch.no_grad():
        t_loc, t_conf, t_lm = ref_retinaface(
            torch.from_numpy(bgr.transpose(0, 3, 1, 2).copy()))

    model = RetinaFace(backbone="mobilenet", out_channel=64)
    loc, conf, lm = model.apply({"params": params}, jnp.asarray(rgb))
    np.testing.assert_allclose(np.asarray(loc), t_loc.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), t_conf.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lm), t_lm.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_priors_match_reference_priorbox():
    """generate_priors == the reference PriorBox for a non-square size."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from swap_face_fine.gpen.face_detect.layers.functions.prior_box import (
        PriorBox,
    )

    cfg = {"min_sizes": [[16, 32], [64, 128], [256, 512]],
           "steps": [8, 16, 32], "clip": False}
    ref = PriorBox(cfg, image_size=(100, 160)).forward().numpy()
    ours = generate_priors((100, 160), CFG_MNET)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_decode_matches_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from swap_face_fine.gpen.face_detect.utils.box_utils import (
        decode,
        decode_landm,
    )

    rng = np.random.default_rng(1)
    n = 50
    priors = np.abs(rng.standard_normal((n, 4)).astype(np.float32)) * 0.2 + 0.1
    loc = rng.standard_normal((n, 4)).astype(np.float32)
    pre = rng.standard_normal((n, 10)).astype(np.float32)
    var = [0.1, 0.2]
    ref_b = decode(torch.from_numpy(loc), torch.from_numpy(priors), var)
    ref_l = decode_landm(torch.from_numpy(pre), torch.from_numpy(priors), var)
    np.testing.assert_allclose(
        np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(priors))),
        ref_b.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(decode_landms(jnp.asarray(pre),
                                 jnp.asarray(priors))).reshape(n, 10),
        ref_l.numpy(), atol=1e-5)


def test_nms_matches_reference_py_cpu_nms():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from swap_face_fine.gpen.face_detect.utils.nms.py_cpu_nms import (
        py_cpu_nms,
    )

    rng = np.random.default_rng(2)
    n = 40
    tl = rng.random((n, 2)).astype(np.float32) * 50
    wh = rng.random((n, 2)).astype(np.float32) * 40 + 5
    boxes = np.concatenate([tl, tl + wh], axis=1)
    scores = rng.random(n).astype(np.float32)
    dets = np.hstack([boxes, scores[:, None]])
    ref_keep = py_cpu_nms(dets, 0.4)
    ref_set = {tuple(np.round(boxes[i], 4)) for i in ref_keep}

    b, sc, keep, _ = jax.jit(
        lambda bb, ss: nms_fixed(bb, ss, n, 0.4))(jnp.asarray(boxes),
                                                  jnp.asarray(scores))
    ours = {tuple(np.round(np.asarray(b)[i], 4))
            for i in range(n) if bool(keep[i])}
    assert ours == ref_set


def test_pairwise_iou_basics():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30],
                         [5, 5, 15, 15]], jnp.float32)
    iou = np.asarray(pairwise_iou(boxes))
    assert iou[0, 1] == pytest.approx(1.0)
    assert iou[0, 2] == pytest.approx(0.0)
    assert iou[0, 3] == pytest.approx(25.0 / 175.0, abs=1e-6)


class _TorchConvBlock(torch.nn.Module):
    """Faithful face-alignment ConvBlock (the FAN building block)."""

    def __init__(self, inp, out):
        super().__init__()
        nn = torch.nn
        self.bn1 = nn.BatchNorm2d(inp)
        self.conv1 = nn.Conv2d(inp, out // 2, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out // 2)
        self.conv2 = nn.Conv2d(out // 2, out // 4, 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out // 4)
        self.conv3 = nn.Conv2d(out // 4, out // 4, 3, 1, 1, bias=False)
        if inp != out:
            self.downsample = torch.nn.Sequential(
                nn.BatchNorm2d(inp), nn.ReLU(True),
                nn.Conv2d(inp, out, 1, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        f = torch.nn.functional
        o1 = self.conv1(f.relu(self.bn1(x), True))
        o2 = self.conv2(f.relu(self.bn2(o1), True))
        o3 = self.conv3(f.relu(self.bn3(o2), True))
        out = torch.cat([o1, o2, o3], 1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class _TorchHourGlass(torch.nn.Module):
    def __init__(self, depth, feat):
        super().__init__()
        self.depth = depth
        for level in range(1, depth + 1):
            self.add_module(f"b1_{level}", _TorchConvBlock(feat, feat))
            self.add_module(f"b2_{level}", _TorchConvBlock(feat, feat))
            self.add_module(f"b3_{level}", _TorchConvBlock(feat, feat))
        self.add_module("b2_plus_1", _TorchConvBlock(feat, feat))

    def _fwd(self, level, inp):
        f = torch.nn.functional
        up1 = getattr(self, f"b1_{level}")(inp)
        low = f.avg_pool2d(inp, 2, stride=2)
        low = getattr(self, f"b2_{level}")(low)
        if level > 1:
            low = self._fwd(level - 1, low)
        else:
            low = self.b2_plus_1(low)
        low = getattr(self, f"b3_{level}")(low)
        up2 = f.interpolate(low, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class _TorchFAN(torch.nn.Module):
    """Faithful face-alignment FAN at a configurable size."""

    def __init__(self, num_modules=2, feat=32, depth=2, nlm=68):
        super().__init__()
        nn = torch.nn
        self.num_modules = num_modules
        self.conv1 = nn.Conv2d(3, feat // 4, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(feat // 4)
        self.conv2 = _TorchConvBlock(feat // 4, feat // 2)
        self.conv3 = _TorchConvBlock(feat // 2, feat // 2)
        self.conv4 = _TorchConvBlock(feat // 2, feat)
        for i in range(num_modules):
            self.add_module(f"m{i}", _TorchHourGlass(depth, feat))
            self.add_module(f"top_m_{i}", _TorchConvBlock(feat, feat))
            self.add_module(f"conv_last{i}", nn.Conv2d(feat, feat, 1))
            self.add_module(f"bn_end{i}", nn.BatchNorm2d(feat))
            self.add_module(f"l{i}", nn.Conv2d(feat, nlm, 1))
            if i < num_modules - 1:
                self.add_module(f"bl{i}", nn.Conv2d(feat, feat, 1))
                self.add_module(f"al{i}", nn.Conv2d(nlm, feat, 1))

    def forward(self, x):
        f = torch.nn.functional
        x = f.relu(self.bn1(self.conv1(x)), True)
        x = f.avg_pool2d(self.conv2(x), 2, stride=2)
        x = self.conv3(x)
        x = self.conv4(x)
        outputs = []
        prev = x
        for i in range(self.num_modules):
            hg = getattr(self, f"m{i}")(prev)
            ll = getattr(self, f"top_m_{i}")(hg)
            ll = f.relu(getattr(self, f"bn_end{i}")(
                getattr(self, f"conv_last{i}")(ll)), True)
            out = getattr(self, f"l{i}")(ll)
            outputs.append(out)
            if i < self.num_modules - 1:
                prev = prev + getattr(self, f"bl{i}")(ll) + getattr(
                    self, f"al{i}")(out)
        return outputs


@pytest.mark.slow
def test_fan_forward_parity():
    """Flax FAN matches a faithful torch face-alignment FAN after
    convert_fan (random torch weights + randomized BN stats)."""
    from e4s2024_tpu.convert.torch_loader import convert_fan

    torch.manual_seed(3)
    tnet = _TorchFAN(num_modules=2, feat=32, depth=2).eval()
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = convert_fan(sd, num_modules=2, depth=2)

    rng = np.random.default_rng(4)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    model = FAN(num_modules=2, features=32, depth=2)
    ours = model.apply({"params": params}, jnp.asarray(x))
    assert len(ours) == len(ref)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r.numpy(),
            atol=3e-4, rtol=1e-3)


def test_heatmap_decode_subpixel():
    """Peak at (y, x) with a larger right neighbor -> +0.25 x offset."""
    hm = np.zeros((1, 16, 16, 2), np.float32)
    hm[0, 5, 7, 0] = 1.0
    hm[0, 5, 8, 0] = 0.5   # right neighbor bigger than left -> dx = +0.25
    hm[0, 4, 7, 0] = 0.4   # top neighbor bigger than bottom -> dy = -0.25
    hm[0, 15, 0, 1] = 1.0  # border peak -> no refinement
    pts = np.asarray(heatmaps_to_landmarks(jnp.asarray(hm)))
    np.testing.assert_allclose(pts[0, 0], [7.25, 4.75])
    np.testing.assert_allclose(pts[0, 1], [0.0, 15.0])


@pytest.fixture(scope="module")
def small_stack():
    det_params = jax.jit(RetinaFace().init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)))["params"]
    det = RetinaFaceDetector(
        det_params, CFG_MNET, DetectorConfig(det_size=160, max_faces=4))
    fan_params = jax.jit(FAN(num_modules=1, features=32, depth=2).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"]
    lmk = FANLandmarker(fan_params, num_modules=1, features=32, resolution=64,
                        depth=2)
    return FaceLandmarkDetector(det, lmk)


def test_detector_fallback_always_returns_a_face(small_stack, rng):
    frame = (rng.random((200, 240, 3)) * 255).astype(np.uint8)
    boxes, scores, lm5 = small_stack.detector.detect(frame)
    assert boxes.shape[0] >= 1 and lm5.shape[1:] == (5, 2)
    lm68 = small_stack(frame)
    assert lm68.shape == (68, 2)
    assert np.isfinite(lm68).all()


def test_landmarks_land_inside_crop_region(small_stack):
    """FAN output coords must map into the face-alignment crop square."""
    frame = np.zeros((300, 300, 3), np.uint8)
    box = np.array([100.0, 120.0, 180.0, 210.0])
    lm = small_stack.landmarker.landmarks(frame, box[None])[0]
    c, side = FANLandmarker.box_to_center_side(box)
    assert np.all(lm[:, 0] >= c[0] - side / 2 - 1e-3)
    assert np.all(lm[:, 0] <= c[0] + side / 2 + 1e-3)
    assert np.all(lm[:, 1] >= c[1] - side / 2 - 1e-3)
    assert np.all(lm[:, 1] <= c[1] + side / 2 + 1e-3)


def test_detect_all_multiface_api(small_stack, rng):
    frame = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    boxes, scores, lm5, lm68 = small_stack.detect_all(frame)
    assert boxes.shape[0] == scores.shape[0] == lm5.shape[0] == lm68.shape[0]
    assert lm68.shape[1:] == (68, 2)


def test_swap_hookless_end_to_end(monkeypatch, rng):
    """FaceSwapper.swap() from raw uint8 frames with NO landmark hook: the
    lazy default_landmarker path (shrunk nets via monkeypatched defaults)."""
    import e4s2024_tpu.pipelines.detect as detect_mod
    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    orig = detect_mod.default_landmarker
    monkeypatch.setattr(
        detect_mod, "default_landmarker",
        lambda **kw: orig(det_size=160, fan_modules=1, fan_features=32,
                          fan_depth=2, fan_resolution=64))

    cfg = SwapConfig(out_size=128, remaining_layer_idx=9, num_blend_levels=4)
    rgi = RGINet(out_size=128, remaining_layer_idx=9)
    img = jnp.zeros((1, 128, 128, 3))
    seg = jnp.asarray(
        np.eye(12, dtype=np.float32)[np.zeros((1, 128, 128), int)])
    rgi_vars = rgi.init(jax.random.PRNGKey(0), img, seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(rgi_vars, bise, cfg)  # note: no landmark_fn

    src = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    tgt = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    with pytest.warns(UserWarning, match="RANDOM"):
        out = swapper.swap(src, tgt)
    assert out.shape == (160, 160, 3) and out.dtype == np.uint8
    # the built stack is cached for subsequent calls
    assert swapper.landmark_fn is not None


def test_gpen_fullframe_hookless_multiface(small_stack, rng):
    """GPENFullFrameEnhancer restores every detected face from the detector's
    own 5-pt landmarks — no landmark_fn hook."""
    from e4s2024_tpu.models.gpen import GPENEnhancer, GPENFullFrameEnhancer
    from e4s2024_tpu.models.gpen import GPENFullGenerator

    model = GPENFullGenerator(size=64, narrow=0.25)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    enh = GPENEnhancer(params["params"], size=64, model=model)
    ff = GPENFullFrameEnhancer(enh, detector=small_stack)
    frame = (rng.random((200, 200, 3)) * 255).astype(np.uint8)
    out = ff.enhance_frame(frame)
    assert out.shape == frame.shape and out.dtype == np.uint8
    assert np.isfinite(out).all()


def test_gpen_fullframe_background_sr(small_stack, rng):
    """With `sr_upscaler` set, the whole frame is super-resolved first and
    faces are restored + pasted on the UPSCALED frame (reference use_sr flow,
    swap_face_fine/gpen/face_enhancement.py:63-67,105-108)."""
    from e4s2024_tpu.models.gpen import GPENEnhancer, GPENFullFrameEnhancer
    from e4s2024_tpu.models.gpen import GPENFullGenerator
    from e4s2024_tpu.ops.resize import resize_nearest

    class FakeSR:
        calls = 0

        def upscale(self, img255):
            FakeSR.calls += 1
            b, h, w, _ = img255.shape
            return resize_nearest(jnp.asarray(img255, jnp.float32),
                                  (4 * h, 4 * w))

    model = GPENFullGenerator(size=64, narrow=0.25)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    enh = GPENEnhancer(params["params"], size=64, model=model)
    ff = GPENFullFrameEnhancer(enh, detector=small_stack, sr_upscaler=FakeSR())
    frame = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    out = ff.enhance_frame(frame)
    assert FakeSR.calls == 1
    assert out.shape == (400, 400, 3) and out.dtype == np.uint8
    assert np.isfinite(out).all()


def test_swap_all_multiface(small_stack, rng):
    """swap_all puts the source identity on every detected target face: one
    batched aligned swap over all F crops, per-face paste-back."""
    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg, landmark_fn=small_stack)
    swapper.rgi = rgi

    src = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    tgt = (rng.random((200, 240, 3)) * 255).astype(np.uint8)
    out = swapper.swap_all(src, tgt, min_score=0.0)
    assert out.shape == tgt.shape and out.dtype == np.uint8
    assert not np.array_equal(out, tgt)  # at least one face replaced

    # a score floor above every detection leaves the frame untouched
    same = swapper.swap_all(src, tgt, min_score=2.0)
    np.testing.assert_array_equal(same, tgt)

    # single-face landmark hooks (no detect_all) are rejected loudly
    swapper_hook = FaceSwapper(v, bise, cfg, landmark_fn=lambda img: None)
    swapper_hook.rgi = rgi
    with pytest.raises(RuntimeError, match="FaceLandmarkDetector"):
        swapper_hook.swap_all(src, tgt)


def test_swap_raises_on_no_face(small_stack, rng):
    """With a confidence floor set (the real-weights default), a frame where
    no detection clears it makes FaceSwapper.swap() raise a clear error
    instead of swapping a confident-garbage fallback candidate."""
    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    gated = FaceLandmarkDetector(small_stack.detector, small_stack.landmarker,
                                 min_score=2.0)  # above any possible score
    assert gated(np.zeros((160, 160, 3), np.uint8)) is None

    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg, landmark_fn=gated)
    swapper.rgi = rgi
    featureless = np.zeros((160, 160, 3), np.uint8)
    with pytest.raises(ValueError, match="no face found in the source"):
        swapper.swap(featureless, featureless)


def test_detect_batch_matches_per_frame(small_stack, rng):
    """detect_batch (the video fast path) must agree with per-frame detect:
    same boxes/scores for every frame of a same-size stack."""
    frames = (rng.random((5, 200, 240, 3)) * 255).astype(np.uint8)
    b_boxes, b_scores, b_lm5 = small_stack.detector.detect_batch(
        frames, chunk=2)
    assert b_boxes.shape[0] == 5
    for i, f in enumerate(frames):
        imgs, scale = small_stack.detector._preprocess(jnp.asarray(f)[None])
        boxes, scores, lm5 = jax.device_get(
            small_stack.detector._run(small_stack.detector._packed, imgs[0]))
        np.testing.assert_allclose(b_boxes[i], boxes / scale,
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(b_scores[i], scores, atol=1e-5, rtol=1e-4)


def test_landmarks_video_matches_per_frame(small_stack, rng):
    """landmarks_video (batched RetinaFace + batched FAN over a clip) must
    match the per-frame __call__ path landmark-for-landmark."""
    frames = (rng.random((4, 200, 240, 3)) * 255).astype(np.uint8)
    lms, scores = small_stack.landmarks_video(frames, chunk=3)
    assert lms.shape == (4, 68, 2) and scores.shape == (4,)
    for i, f in enumerate(frames):
        lm = small_stack(f)
        np.testing.assert_allclose(lms[i], lm, atol=1e-2, rtol=1e-4)
