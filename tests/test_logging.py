import numpy as np

from virnet_tpu.train.logging import TrainWriter, _to_grid, make_log


def test_to_grid_shapes():
    batch = np.random.default_rng(0).random((5, 8, 10, 3)).astype(np.float32)
    grid = _to_grid(batch, normalize=True, pad=2)
    # 5 images -> 3 cols x 2 rows
    assert grid.shape == (2 * 10 + 2, 3 * 12 + 2, 3)
    assert grid.min() >= 0.0 and grid.max() <= 1.0


def test_train_writer_smoke(tmp_path):
    w = TrainWriter(tmp_path / "logs")
    w.scalar("loss", 1.0, 0)
    w.image_grid("imgs", np.zeros((2, 4, 4, 3), dtype=np.float32), 0)
    w.close()
    # tensorboardX present in this image -> event file written
    assert any((tmp_path / "logs").iterdir())


def test_make_log_writes_file(tmp_path):
    logger = make_log(tmp_path / "x.log", name="t1")
    logger.info("hello-world")
    for h in logger.handlers:
        h.flush()
    assert "hello-world" in (tmp_path / "x.log").read_text()
