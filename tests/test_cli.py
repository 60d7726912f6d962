"""CLI-layer tests: data tools round-trips (no GUI, no full training)."""

import os

import numpy as np
import pytest

from spnet_tpu.cli.augment_preproc import augment_data
from spnet_tpu.cli.gen_bboxes import ellipse_bbox, gen_bboxes
from spnet_tpu.cli.gen_fake_espi import main as gen_main
from spnet_tpu.cli.parse_zooniverse import parse_zooniverse_csv
from spnet_tpu.cli.setup_data import distribute_dataset
from spnet_tpu.data.csvio import paired_file_lists, parse_meta_file


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("data"))
    gen_main(["-d", d, "-n", "8", "--batch", "4", "--seed", "1"])
    return d


def test_gen_fake_espi_cli(dataset):
    imgs, metas = paired_file_lists(os.path.join(dataset, "Train") + os.sep)
    assert len(imgs) == 8


def test_gen_bboxes(dataset, tmp_path):
    out = str(tmp_path / "boxes.csv")
    n = gen_bboxes(os.path.join(dataset, "Train"), out)
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "filename,width,height,label,xmin,ymin,xmax,ymax"
    assert len(lines) == n + 1
    # bbox must contain the ellipse center
    for ln in lines[1:3]:
        f, w, h, lbl, x0, y0, x1, y1 = ln.split(",")
        assert int(x0) <= int(x1) and int(y0) <= int(y1)
        assert lbl == "object"


def test_ellipse_bbox_axis_aligned():
    # 0 deg: dx = a, dy = b ; 90 deg: swapped
    assert ellipse_bbox(100, 100, 50, 20, 0, clip=False) == (50, 80, 150, 120)
    assert ellipse_bbox(100, 100, 50, 20, 90, clip=False) == (80, 50, 120, 150)


def test_parse_zooniverse(tmp_path, dataset):
    # build an aggregated CSV referencing generated frames
    imgs, metas = paired_file_lists(os.path.join(dataset, "Train") + os.sep)
    agg = tmp_path / "agg.csv"
    rows = []
    base = os.path.basename(imgs[0])
    rows.append(f"100,120,{base},3,20,45,30")    # b > a: must swap +90
    rows.append(f"100,120,{base},3,20,45,30")    # duplicate: dropped
    rows.append(f"200,150,{base},0,30,20,10")    # zero rings: dropped
    rows.append(f"250,200,{base},5,60,25,100")
    agg.write_text("\n".join(rows) + "\n")

    out = str(tmp_path / "parsed")
    n = parse_zooniverse_csv(str(agg), os.path.join(dataset, "Train"), out)
    assert n == 2
    meta = os.path.join(out, os.path.splitext(base)[0] + ".csv")
    recs = parse_meta_file(meta)  # canonicalizes + validates
    assert recs.shape == (2, 8)
    assert (recs[:, 2] >= recs[:, 3]).all()  # a >= b after swap
    # image copied alongside
    assert os.path.exists(os.path.join(out, base))


def test_augment_cli(tmp_path, dataset):
    # copy two files into a fresh dir, inflate 3x
    import shutil

    src_imgs, src_metas = paired_file_lists(
        os.path.join(dataset, "Train") + os.sep
    )
    work = tmp_path / "aug"
    work.mkdir()
    for f in (*src_imgs[:2], *src_metas[:2]):
        shutil.copy(f, work)
    augment_data(str(work), n_augs=3, seed=0)
    imgs, metas = paired_file_lists(str(work) + os.sep)
    assert len(imgs) == 2 * (1 + 3)
    # augmented labels still parse + stay finite
    for m in metas:
        recs = parse_meta_file(m)
        assert np.isfinite(recs).all()


def test_setup_data(tmp_path, dataset):
    out = str(tmp_path / "dist")
    n = distribute_dataset(os.path.join(dataset, "Train"), out, k=0)
    tr, _ = paired_file_lists(os.path.join(out, "Train") + os.sep)
    vl, _ = paired_file_lists(os.path.join(out, "Val") + os.sep)
    assert len(tr) + len(vl) == n
    assert len(tr) > len(vl)


@pytest.mark.slow
def test_train_cli_inprocess(tmp_path, monkeypatch):
    """The full `spnet_tpu train` surface, in-process on a tiny config."""
    from spnet_tpu.cli.train import main as train_main

    d = str(tmp_path / "d")
    gen_main(["-d", d, "-n", "24", "--batch", "8", "--seed", "2", "-a"])
    monkeypatch.chdir(tmp_path)
    train_main([
        "-d", d, "-e", "1", "-b", "2", "--backbone", "MobileNetTiny",
        "--input_size", "64", "--dtype", "float32", "-w",
        str(tmp_path / "ckpt"), "--no-eval",
    ])
    assert (tmp_path / "ckpt" / "experiment.json").exists()
