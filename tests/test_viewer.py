"""Network-GUI protocol tests.

1. Wire roundtrip: a fake SIBR viewer client connects over TCP, requests a
   render with the reference wire format, and receives the RGB buffer +
   verify string.  (The server thread polls with a deadline — the poll API
   is non-blocking by design, matching the reference's in-loop usage.)
2. Loop integration: ``train_loop`` with a ``ViewerHook`` serves a frame of
   the *live* model to a client that connects mid-training
   (reference hook: ``train_single.py:80-97``).
"""

import json
import socket
import threading
import time

import jax.numpy as jnp
import numpy as np

from street_sparse_3dgs_tpu.viewer.network_gui import NetworkGUI


def _viewer_msg(w, h, view=None, keep_alive=False, train=True):
    if view is None:
        view = np.eye(4, dtype=np.float32)
    return json.dumps({
        "resolution_x": w, "resolution_y": h, "train": train,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": keep_alive, "scaling_modifier": 1.0,
        "view_matrix": np.asarray(view, np.float32).flatten().tolist(),
        "view_projection_matrix": np.eye(4).flatten().tolist(),
    }).encode()


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        assert part, "server closed early"
        buf += part
    return buf


def test_network_gui_roundtrip():
    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    W, H = 32, 24

    rendered = {}

    def render_fn(req):
        cam = req.camera()
        rendered["size"] = (cam.width, cam.height)
        rendered["campos"] = np.asarray(cam.campos)
        img = np.zeros((3, req.height, req.width), np.float32)
        img[0] = 0.5
        return img

    stop = threading.Event()

    def server():
        # Poll (non-blocking, like the training loop) until one request is
        # served or the deadline passes.
        deadline = time.monotonic() + 10.0
        while not rendered and time.monotonic() < deadline \
                and not stop.is_set():
            gui.poll(render_fn, "srcpath")
            time.sleep(0.005)

    t = threading.Thread(target=server)
    t.start()
    try:
        client = socket.create_connection(("127.0.0.1", port), timeout=10)
        client.settimeout(10)
        view = np.eye(4, dtype=np.float32)
        view[3, :3] = [1.0, 2.0, 3.0]   # row-vector convention translation
        msg = _viewer_msg(W, H, view)
        client.sendall(len(msg).to_bytes(4, "little") + msg)

        buf = _recv_exact(client, H * W * 3)
        img = np.frombuffer(buf, np.uint8).reshape(H, W, 3)
        assert (img[..., 0] == 127).all() or (img[..., 0] == 128).all()
        assert (img[..., 1] == 0).all()
        vlen = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, vlen).decode() == "srcpath"
        client.close()
    finally:
        stop.set()
        t.join(timeout=15)
        gui.close()
    assert rendered["size"] == (W, H)
    # Row-vector translation (1,2,3) with the protocol's y/z column sign
    # flip: R=diag(1,-1,-1), t=(1,-2,-3) ⇒ campos = -R⁻¹t = (-1,-2,-3).
    np.testing.assert_allclose(rendered["campos"], [-1.0, -2.0, -3.0],
                               atol=1e-5)


def test_viewer_receives_frame_mid_training():
    """A fake client connected while train_loop runs gets a live frame."""
    import jax

    from street_sparse_3dgs_tpu.config import (ModelConfig,
                                               OptimizationConfig,
                                               PipelineConfig)
    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.models.gaussians import create_from_pcd
    from street_sparse_3dgs_tpu.train.loop import LoopHooks, train_loop
    from street_sparse_3dgs_tpu.train.step import CameraBatch, init_state
    from street_sparse_3dgs_tpu.viewer.hook import ViewerHook

    W = H = 32
    scene = make_toy_scene(seed=5, n=64, n_cameras=2, width=W, height=H)
    params, active, meta = create_from_pcd(
        jax.random.PRNGKey(0), np.asarray(scene.means3d),
        np.full((64, 3), 0.5, np.float32), sh_degree=1, capacity=128)
    state = init_state(params, active, n_images=2)
    batches = [CameraBatch(
        camera=cam, gt_image=jnp.zeros((3, H, W)),
        alpha_mask=jnp.ones((1, H, W)), mono_invdepth=jnp.zeros((1, H, W)),
        depth_mask=jnp.zeros((1, H, W)), depth_reliable=jnp.array(False),
        image_index=jnp.int32(i)) for i, cam in enumerate(scene.cameras)]

    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    pipe = PipelineConfig(tile_capacity=128, max_dup=16)
    hook = ViewerHook(gui, "livesrc", pipe)

    result = {}

    def client():
        sock = socket.create_connection(("127.0.0.1", port), timeout=15)
        sock.settimeout(15)
        # Use the training camera's pose (identity-ish view from toy scene):
        msg = _viewer_msg(W, H, np.eye(4, dtype=np.float32),
                          keep_alive=False, train=True)
        sock.sendall(len(msg).to_bytes(4, "little") + msg)
        buf = _recv_exact(sock, H * W * 3)
        result["frame"] = np.frombuffer(buf, np.uint8).reshape(H, W, 3)
        vlen = int.from_bytes(_recv_exact(sock, 4), "little")
        result["verify"] = _recv_exact(sock, vlen).decode()
        sock.close()

    t = threading.Thread(target=client)
    t.start()

    opt = OptimizationConfig(iterations=40)
    # Many iterations so the client has plenty of polls to land in.
    train_loop(state, meta, batches, opt, pipe, ModelConfig(),
               cameras_extent=1.0, spatial_lr_scale=1.0,
               iterations=40, densify_enabled=False,
               hooks=LoopHooks(viewer_poll=hook))
    t.join(timeout=30)
    gui.close()

    assert result.get("verify") == "livesrc"
    assert result["frame"].shape == (H, W, 3)


# ---------------------------------------------------------------------------
# Standalone viewer app (viewer/app.py — the SIBR viewer-app analogue)


def _toy_scene_dir(tmp_path):
    import jax
    from street_sparse_3dgs_tpu.data.ply import save_gaussian_ply
    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.models.gaussians import GaussianParams

    s = make_toy_scene(seed=3, n=256, n_cameras=1)
    n = s.means3d.shape[0]
    params = GaussianParams(
        xyz=np.asarray(s.means3d),
        features_dc=np.asarray(s.sh_coeffs[:, :1]),
        features_rest=np.asarray(s.sh_coeffs[:, 1:]),
        log_scales=np.log(np.asarray(s.scales)),
        quats=np.asarray(s.quats),
        opacity_raw=np.log(np.asarray(s.opacities) /
                           (1 - np.asarray(s.opacities)))[:, None])
    save_gaussian_ply(tmp_path / "point_cloud.ply", params)
    return tmp_path


def test_viewer_app_scene_render(tmp_path):
    from street_sparse_3dgs_tpu.viewer.app import SceneSource

    src = SceneSource(_toy_scene_dir(tmp_path))
    state = src.initial_state()
    frame = src.render(state, 96, 64)
    assert frame.shape == (64, 96, 3) and frame.dtype == np.uint8
    assert frame.std() > 2.0            # looking at the cloud, not void


def test_viewer_app_http_roundtrip(tmp_path):
    from street_sparse_3dgs_tpu.viewer.app import SceneSource, ViewerApp

    src = SceneSource(_toy_scene_dir(tmp_path))
    app = ViewerApp(src, port=0)
    app.serve_background()
    try:
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", app.port, timeout=30)
        conn.request("GET", "/")
        page = conn.getresponse().read()
        assert b"street_sparse_3dgs_tpu" in page and b"tick()" in page
        conn.request("GET", "/info")
        info = json.loads(conn.getresponse().read())
        assert info["n_points"] == 256
        body = json.dumps({"pos": info["pos"], "yaw": info["yaw"],
                           "pitch": info["pitch"], "width": 64,
                           "height": 48})
        conn.request("POST", "/frame", body=body)
        resp = conn.getresponse()
        blob = resp.read()
        assert resp.status == 200 and blob[:2] == b"\xff\xd8"  # JPEG magic
    finally:
        app.close()


def test_live_source_speaks_sibr_protocol(tmp_path):
    """LiveSource (the app's training-bridge mode) must interoperate with
    NetworkGUI: the camera it encodes on the wire must reconstruct to the
    same render camera on the training side."""
    from street_sparse_3dgs_tpu.viewer.app import FlyState, LiveSource

    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    state = FlyState(pos=np.array([1.0, -2.0, 0.5]), yaw=0.7, pitch=-0.2)
    W, H = 48, 32
    got = {}

    def server():
        deadline = time.time() + 30
        while "cam" not in got and time.time() < deadline:
            def render_fn(req):
                got["cam"] = req.camera()
                return jnp.zeros((3, req.height, req.width))
            gui.poll(render_fn, "src")
            time.sleep(0.01)

    th = threading.Thread(target=server, daemon=True)
    th.start()
    client = LiveSource(port=port)
    frame = client.render(state, W, H)
    th.join(timeout=30)
    client.close()
    gui.close()
    assert frame.shape == (H, W, 3)
    want = state.camera(W, H)
    cam = got["cam"]
    np.testing.assert_allclose(np.asarray(cam.viewmatrix),
                               np.asarray(want.viewmatrix), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.campos),
                               np.asarray(want.campos), atol=1e-4)
