"""Moving-object mask generation (preprocess/mask_images.py) against the
reference policy in ss_utils/mask_images.py: auto classes, contact rule for
bicycles, confirmation flow, inversion + manual-mask union, HTTP UI."""

import threading
import urllib.request
import urllib.parse

import numpy as np
from PIL import Image

from street_sparse_3dgs_tpu.preprocess import mask_images as mi


def det(*items, hw=(12, 12)):
    """items: (label, score, mask_box=(y0,y1,x0,x1))"""
    labels, scores, masks = [], [], []
    for lab, sc, (y0, y1, x0, x1) in items:
        m = np.zeros(hw, np.float32)
        m[y0:y1, x0:x1] = 1.0
        labels.append(lab)
        scores.append(sc)
        masks.append(m)
    return mi.Detections(np.array(labels or [0][:0], np.int64),
                         np.array(scores or [0.0][:0]),
                         np.stack(masks) if masks else np.zeros((0, *hw)))


def test_policy_auto_and_contact():
    d = det((1, 0.9, (0, 4, 0, 4)),      # person -> auto
            (2, 0.9, (2, 6, 2, 6)),      # bicycle touching person -> confirm
            (2, 0.9, (8, 12, 8, 12)),    # parked bicycle -> discarded
            (3, 0.9, (6, 9, 0, 3)),      # car -> confirm
            (8, 0.3, (0, 12, 0, 12)))    # low-score truck -> dropped
    prop = mi.combine_detections(d)
    assert prop.auto_mask is not None and prop.auto_mask[1, 1] == 1
    assert prop.to_confirm_names == ["bicycle/motorbike", "car"]


def test_save_mask_inverts_and_unions_manual(tmp_path):
    mask = np.zeros((6, 6), np.uint8)
    mask[0:2, 0:2] = 1
    manual = np.full((6, 6), 255, np.uint8)   # white = keep everywhere
    manual[4:6, 4:6] = 0                      # hand-masked corner
    keep = mi.save_mask(mask, tmp_path / "m.jpg", (6, 6), manual)
    on_disk = np.asarray(Image.open(tmp_path / "m.png"))
    assert (on_disk == keep).all()
    assert keep[0, 0] == 0            # detected object removed
    assert keep[5, 5] == 0            # manual mask removed
    assert keep[3, 3] == 255          # rest kept


def make_project(tmp_path, n=3, hw=(12, 12)):
    imgs = tmp_path / "inputs" / "images" / "cam0"
    imgs.mkdir(parents=True)
    for i in range(n):
        Image.fromarray(
            np.full((*hw, 3), 50 * i, np.uint8)).save(imgs / f"v{i}_f1.jpg")
    return tmp_path


def test_process_images_precomputed_and_resume(tmp_path):
    make_project(tmp_path)
    ddir = tmp_path / "det"
    (ddir / "cam0").mkdir(parents=True)
    person = np.zeros((1, 12, 12), np.float32)
    person[0, 0:3, 0:3] = 1
    np.savez(ddir / "cam0" / "v0_f1.jpg.npz",
             labels=np.array([1]), scores=np.array([0.95]), masks=person)
    detector = mi.precomputed_detector(ddir)

    n = mi.process_images(tmp_path, detector, decide=lambda *_: True)
    assert n == 3
    m0 = np.asarray(Image.open(
        tmp_path / "inputs" / "masks" / "cam0" / "v0_f1.png"))
    assert m0[1, 1] == 0 and m0[6, 6] == 255
    m1 = np.asarray(Image.open(
        tmp_path / "inputs" / "masks" / "cam0" / "v1_f1.png"))
    assert (m1 == 255).all()          # no detections file -> keep all
    # Resumable: second run writes nothing new.
    assert mi.process_images(tmp_path, detector) == 0


def test_process_6_images_skips_extra_faces(tmp_path):
    imgs = tmp_path / "inputs" / "images"
    imgs.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(imgs / "a_f1.jpg")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(imgs / "a_d2.jpg")

    calls = []

    def detector(image):
        calls.append(1)
        return mi.Detections(np.zeros(0, np.int64), np.zeros(0),
                             np.zeros((0, 8, 8)))

    n = mi.process_images(tmp_path, detector, process_6_images=True)
    assert n == 2 and len(calls) == 1  # _d2 face skipped without detection
    extra = np.asarray(Image.open(tmp_path / "inputs" / "masks" / "a_d2.png"))
    assert (extra == 255).all()


def test_confirmation_server_roundtrip(tmp_path):
    """A fake user confirms one car via HTTP; the written mask reflects it."""
    make_project(tmp_path, n=1)
    ddir = tmp_path / "det"
    (ddir / "cam0").mkdir(parents=True)
    car = np.zeros((1, 12, 12), np.float32)
    car[0, 4:8, 4:8] = 1
    np.savez(ddir / "cam0" / "v0_f1.jpg.npz",
             labels=np.array([3]), scores=np.array([0.9]), masks=car)

    srv = mi.ConfirmationServer(tmp_path, mi.precomputed_detector(ddir),
                                port=0)
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    # Wait until the server binds and the overlay is pending.
    import time
    deadline = time.time() + 30
    page = ""
    while time.time() < deadline:
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/", timeout=2).read().decode()
            if "car" in page:
                break
        except OSError:
            pass
        time.sleep(0.1)
    assert "car" in page
    data = urllib.parse.urlencode({"choice": "confirm"}).encode()
    urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/decide", data=data, timeout=5)
    t.join(timeout=30)
    assert not t.is_alive()
    mask = np.asarray(Image.open(
        tmp_path / "inputs" / "masks" / "cam0" / "v0_f1.png"))
    assert mask[5, 5] == 0 and mask[0, 0] == 255
