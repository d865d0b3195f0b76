"""Network-GUI protocol test: a fake SIBR viewer client connects over TCP,
requests a render with the reference wire format, and receives the RGB
buffer + verify string."""

import json
import socket
import threading

import numpy as np

from street_sparse_3dgs_tpu.viewer.network_gui import NetworkGUI


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

    def server():
        # Poll until one request is served.
        for _ in range(100):
            gui.poll(render_fn, "srcpath")
            if rendered:
                break

    t = threading.Thread(target=server)
    t.start()

    client = socket.create_connection(("127.0.0.1", port), timeout=5)
    view = np.eye(4, dtype=np.float32)
    view[3, :3] = [1.0, 2.0, 3.0]   # row-vector convention translation
    msg = json.dumps({
        "resolution_x": W, "resolution_y": H, "train": True,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": view.flatten().tolist(),
        "view_projection_matrix": np.eye(4).flatten().tolist(),
    }).encode()
    client.sendall(len(msg).to_bytes(4, "little") + msg)

    buf = b""
    want = H * W * 3
    while len(buf) < want:
        part = client.recv(want - len(buf))
        assert part
        buf += part
    img = np.frombuffer(buf, np.uint8).reshape(H, W, 3)
    assert (img[..., 0] == 127).all() or (img[..., 0] == 128).all()
    vlen = int.from_bytes(client.recv(4), "little")
    assert client.recv(vlen).decode() == "srcpath"
    client.close()
    t.join(timeout=10)
    gui.close()
    assert rendered["size"] == (W, H)
