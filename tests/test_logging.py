"""MetricWriter: csv/jsonl output plus the TensorBoard scalar mirror
(the reference's TF1 summary_writer surface, SURVEY.md section 5 item 5)."""

import csv
import json
import os

from deeprl_network_tpu.utils.logging import MetricWriter


def test_metric_writer_csv_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), "train_log")
    w.write({"step": 10, "loss": 1.5})
    w.write({"step": 20, "loss": 0.5})
    with open(tmp_path / "train_log.csv") as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["10.0", "20.0"]
    with open(tmp_path / "train_log.jsonl") as f:
        assert json.loads(f.readlines()[1])["loss"] == 0.5


def test_metric_writer_tensorboard_mirror(tmp_path):
    import pytest
    pytest.importorskip("torch.utils.tensorboard")
    tb = tmp_path / "tb"
    w = MetricWriter(str(tmp_path), "train_log", tb_dir=str(tb))
    w.write({"step": 10, "loss": 1.5, "episode_return": -3.0})
    w.close()
    event_files = [f for f in os.listdir(tb / "train_log")
                   if "tfevents" in f]
    assert event_files, "no TensorBoard event file written"
    assert os.path.getsize(tb / "train_log" / event_files[0]) > 0
