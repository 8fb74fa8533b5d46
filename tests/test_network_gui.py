"""SIBR viewer TCP protocol: loopback round trip."""

import json
import socket
import threading

import numpy as np

from instantsplat_tpu.render.network_gui import NetworkGUI


def test_viewer_protocol_roundtrip():
    gui = NetworkGUI()
    gui.init("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    h, w = 8, 12
    view = np.eye(4)
    msg = dict(
        resolution_x=w, resolution_y=h, train=False,
        fov_y=0.8, fov_x=1.0, z_near=0.01, z_far=100.0,
        shs_python=False, rot_scale_python=False, keep_alive=True,
        scaling_modifier=1.0,
        view_matrix=view.flatten().tolist(),
        view_projection_matrix=view.flatten().tolist(),
    )

    result = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode("utf-8")
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < h * w * 3:
            img += c.recv(h * w * 3 - len(img))
        n = int.from_bytes(c.recv(4), "little")
        verify = c.recv(n).decode("ascii")
        result["img"] = np.frombuffer(img, np.uint8).reshape(h, w, 3)
        result["verify"] = verify
        c.close()

    t = threading.Thread(target=client)
    t.start()
    req = None
    import time

    for _ in range(100):
        req = gui.poll()
        if req is not None:
            break
        time.sleep(0.05)  # wait out the nonblocking-accept race
    assert req is not None
    assert (req.width, req.height) == (w, h)
    assert req.keep_alive
    cam = req.camera  # decodes to our Camera type
    assert (cam.height, cam.width) == (h, w)

    frame = np.linspace(0, 1, h * w * 3).reshape(h, w, 3)
    gui.send_image(frame, verify="scene/path")
    t.join(timeout=5)
    gui.close()
    assert result["verify"] == "scene/path"
    np.testing.assert_allclose(
        result["img"], np.clip(frame * 255 + 0.5, 0, 255).astype(np.uint8))
