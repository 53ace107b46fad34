"""Tests for auxiliary components: LPIPS, SuperPoint, checkpoints,
network GUI protocol, config parsing, cam augmentations."""

import json
import socket
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.pose import lpips as lpips_mod
from sixdgs_tpu.pose import superpoint
from sixdgs_tpu.pose.cam_augmentations import (
    make_normalization_reverser,
    make_reverse_pos_enc,
)
from sixdgs_tpu.utils.config import parse_cfg_args, write_cfg_args, read_cfg_args


class TestLPIPS:
    def test_zero_for_identical(self):
        params = lpips_mod.init_params(jax.random.key(0))
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 64, 64)).astype(np.float32))
        d = float(lpips_mod.lpips_distance(params, img, img))
        assert abs(d) < 1e-6

    def test_positive_for_different(self):
        params = lpips_mod.init_params(jax.random.key(0))
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(size=(3, 64, 64)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(3, 64, 64)).astype(np.float32))
        assert float(lpips_mod.lpips_distance(params, a, b)) > 0

    def test_alex_variant(self):
        params = lpips_mod.init_params(jax.random.key(1), net="alex")
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(size=(3, 64, 64)).astype(np.float32))
        d = float(lpips_mod.lpips_distance(params, a, a, net="alex"))
        assert abs(d) < 1e-6

    def test_save_load(self, tmp_path):
        params = lpips_mod.init_params(jax.random.key(2))
        p = str(tmp_path / "lpips.npz")
        lpips_mod.save_params(p, params)
        fn = lpips_mod.make_lpips(p)
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
        ref = float(lpips_mod.lpips_distance(params, a, b))
        assert abs(float(fn(a, b)) - ref) < 1e-5

    def test_vgg_matches_torch_arch(self):
        """Same weights into a torch VGG16-features stack -> same taps."""
        torch = pytest.importorskip("torch")
        params = lpips_mod.init_params(jax.random.key(3))
        rng = np.random.default_rng(4)
        img01 = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        x = 2 * img01 - 1
        x = (x - lpips_mod._SHIFT[:, None, None]) / lpips_mod._SCALE[:, None, None]
        ours = lpips_mod.vgg16_features(params, jnp.asarray(x))

        t = torch.from_numpy(x)[None]
        conv_i = 0
        taps = []
        with torch.no_grad():
            for item in lpips_mod.VGG16_CFG:
                if item == "M":
                    t = torch.nn.functional.max_pool2d(t, 2, 2)
                else:
                    w = torch.from_numpy(np.asarray(params[f"conv{conv_i}.w"], np.float32))
                    b = torch.from_numpy(np.asarray(params[f"conv{conv_i}.b"], np.float32))
                    t = torch.nn.functional.relu(
                        torch.nn.functional.conv2d(t, w, b, padding=1)
                    )
                    if conv_i in lpips_mod.VGG_TAPS:
                        taps.append(t[0].numpy())
                    conv_i += 1
        for a, b in zip(ours, taps):
            np.testing.assert_allclose(np.asarray(a), b, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("net", ["vgg", "alex"])
    def test_value_parity_vs_reference(self, net):
        """Full LPIPS VALUE parity against the reference's own forward code
        (/root/reference/lpipsPyTorch/modules/lpips.py:30-36): identical
        random weights into both, identical [0,1] image pairs in, matching
        distances out. The reference ctor downloads pretrained torchvision
        backbones (unavailable here), so ``layers`` is rebuilt as the
        identical Conv/ReLU/MaxPool sequence with torch.nn and the reference's
        unmodified BaseNet/LPIPS forward path is executed over it."""
        import sys
        import types

        torch = pytest.importorskip("torch")
        if "torchvision" not in sys.modules:
            # networks.py imports torchvision at module top purely for the
            # pretrained ctors we never call; satisfy the import with a stub.
            # The stub needs a real ModuleSpec: transformers (imported by a
            # LATER test in the session) probes torchvision via
            # importlib.util.find_spec, which raises on __spec__ = None
            import importlib.machinery

            tv = types.ModuleType("torchvision")
            tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
            tv.__version__ = "0.0.0-stub"
            tv.models = types.ModuleType("torchvision.models")
            tv.models.__spec__ = importlib.machinery.ModuleSpec(
                "torchvision.models", None)
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from lpipsPyTorch.modules.lpips import LPIPS
        from lpipsPyTorch.modules.networks import (
            AlexNet, BaseNet, LinLayers, VGG16,
        )

        params = lpips_mod.init_params(jax.random.key(5), net=net)
        # perturb lin weights away from the uniform default so the weighted
        # stage sum is actually exercised
        channels = (lpips_mod.VGG_CHANNELS if net == "vgg"
                    else lpips_mod.ALEX_CHANNELS)
        rng = np.random.default_rng(6)
        for i, c in enumerate(channels):
            params[f"lin{i}.w"] = jnp.asarray(
                rng.uniform(0.1, 1.0, size=c).astype(np.float32))

        nn = torch.nn
        if net == "vgg":
            # torchvision vgg16().features layer sequence
            seq, cin = [], 3
            for item in lpips_mod.VGG16_CFG:
                if item == "M":
                    seq.append(nn.MaxPool2d(2, 2))
                else:
                    seq += [nn.Conv2d(cin, item, 3, padding=1),
                            nn.ReLU(inplace=True)]
                    cin = item
            target_layers = [4, 9, 16, 23, 30]
        else:
            # torchvision alexnet().features layer sequence
            seq = [
                nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
            ]
            target_layers = [2, 5, 8, 10, 12]

        cls = VGG16 if net == "vgg" else AlexNet
        tnet = cls.__new__(cls)
        BaseNet.__init__(tnet)
        tnet.layers = nn.Sequential(*seq)
        tnet.target_layers = target_layers
        tnet.n_channels_list = list(channels)
        with torch.no_grad():
            convs = [m for m in tnet.layers if isinstance(m, torch.nn.Conv2d)]
            for i, m in enumerate(convs[: 13 if net == "vgg" else 5]):
                m.weight.copy_(torch.from_numpy(
                    np.asarray(params[f"conv{i}.w"], np.float32)))
                m.bias.copy_(torch.from_numpy(
                    np.asarray(params[f"conv{i}.b"], np.float32)))
        tnet.set_requires_grad(False)

        crit = LPIPS.__new__(LPIPS)
        torch.nn.Module.__init__(crit)
        crit.net = tnet
        crit.lin = LinLayers(tnet.n_channels_list)
        with torch.no_grad():
            for i, l in enumerate(crit.lin):
                l[1].weight.copy_(torch.from_numpy(
                    np.asarray(params[f"lin{i}.w"], np.float32)
                ).reshape(1, -1, 1, 1))

        img_rng = np.random.default_rng(7)
        for trial in range(3):
            a = img_rng.uniform(size=(3, 48, 48)).astype(np.float32)
            b = np.clip(a + img_rng.normal(scale=0.1 * (trial + 1),
                                           size=a.shape), 0, 1).astype(np.float32)
            ref = float(crit(torch.from_numpy(a)[None],
                             torch.from_numpy(b)[None]))
            ours = float(lpips_mod.lpips_distance(
                params, jnp.asarray(a), jnp.asarray(b), net=net))
            assert abs(ours - ref) < max(1e-5, 1e-3 * abs(ref)), (ours, ref)


class TestSuperPoint:
    def test_shapes_and_norm(self):
        params = superpoint.init_params(jax.random.key(0))
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 224, 224)).astype(np.float32))
        out = superpoint.forward_features(params, img)["x_norm_patchtokens"]
        assert out.shape == (28 * 28, 256)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-4)


class TestGSCheckpoint:
    def test_roundtrip_and_resume(self):
        from sixdgs_tpu.scene.gaussians import from_arrays
        from sixdgs_tpu.train.checkpoint import load_train_state, save_train_state
        from sixdgs_tpu.train.gs_trainer import init_train_state

        rng = np.random.default_rng(0)
        n = 20
        arrs = {
            "xyz": rng.normal(size=(n, 3)).astype(np.float32),
            "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
            "features_rest": np.zeros((n, 15, 3), np.float32),
            "opacity": rng.normal(size=(n, 1)).astype(np.float32),
            "scaling": rng.normal(size=(n, 3)).astype(np.float32),
            "rotation": rng.normal(size=(n, 4)).astype(np.float32),
        }
        state = init_train_state(from_arrays(arrs, 3, capacity=32))
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "chkpnt100.npz")
            save_train_state(p, state, 100, 2)
            state2, it, sh = load_train_state(p)
            assert it == 100 and sh == 2
            np.testing.assert_allclose(np.asarray(state2.scene.xyz), np.asarray(state.scene.xyz))
            np.testing.assert_allclose(np.asarray(state2.adam.m["xyz"]), 0.0)


class TestNetworkGUI:
    def test_protocol_roundtrip(self):
        from sixdgs_tpu.renderer.network_gui import NetworkGUI, image_to_bytes

        gui = NetworkGUI(port=0)  # pick free port? bind requires explicit port
        # rebind on an ephemeral port
        port = gui.listener.getsockname()[1]

        msg = {
            "resolution_x": 8, "resolution_y": 6, "train": True,
            "fov_y": 0.8, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False, "keep_alive": True,
            "scaling_modifier": 1.0,
            "view_matrix": np.eye(4).flatten().tolist(),
            "view_projection_matrix": np.eye(4).flatten().tolist(),
        }

        received = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            payload = json.dumps(msg).encode()
            s.sendall(len(payload).to_bytes(4, "little") + payload)
            want = 8 * 6 * 3 + 4 + len("verify")
            buf = b""
            while len(buf) < want:
                chunk = s.recv(4096)
                if not chunk:
                    break
                buf += chunk
            received["buf"] = buf
            s.close()

        th = threading.Thread(target=client)
        th.start()
        import time as _time

        for _ in range(200):
            gui.try_connect()
            if gui.conn is not None:
                break
            _time.sleep(0.02)
        assert gui.conn is not None, "client never connected"
        cam, do_training, *_ = gui.receive()
        assert cam.width == 8 and cam.height == 6
        assert do_training is True
        img = np.zeros((3, 6, 8), np.float32)
        gui.send(image_to_bytes(img), "verify")
        th.join(timeout=10)
        gui.close()
        buf = received["buf"]
        assert len(buf) == 144 + 4 + 6
        assert int.from_bytes(buf[144:148], "little") == 6
        assert buf[148:] == b"verify"


class TestConfig:
    def test_parse_reference_repr(self):
        text = (
            "Namespace(sh_degree=3, source_path='/data/scene', model_path='out', "
            "images='images', resolution=-1, white_background=True, "
            "data_device='cuda', eval=False, fps_sampling=-1.5, "
            "extra_list=[1, 2, 3], nothing=None)"
        )
        cfg = parse_cfg_args(text)
        assert cfg["sh_degree"] == 3
        assert cfg["source_path"] == "/data/scene"
        assert cfg["white_background"] is True
        assert cfg["eval"] is False  # real bool, not the upstream bool("False") bug
        assert cfg["fps_sampling"] == -1.5
        assert cfg["extra_list"] == [1, 2, 3]
        assert cfg["nothing"] is None

    def test_write_read_roundtrip(self, tmp_path):
        cfg = {"a": 1, "b": "x y", "c": True, "d": -2.5, "e": None}
        write_cfg_args(str(tmp_path), cfg)
        back = read_cfg_args(str(tmp_path))
        assert back == cfg


class TestCamAugmentations:
    def test_normalization_reverser(self):
        rng = np.random.default_rng(0)
        targets = jnp.asarray(rng.normal(2.0, 3.0, size=(100, 3)).astype(np.float32))
        fn = make_normalization_reverser(targets)
        out = np.asarray(fn(jnp.zeros(3)))
        np.testing.assert_allclose(out, np.asarray(targets).mean(0), atol=1e-5)

    def test_reverse_pos_enc_shape(self):
        fn = make_reverse_pos_enc(10)
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(33,)).astype(np.float32))
        out = fn(x)
        assert out.shape == (3,)
