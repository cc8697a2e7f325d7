"""Utils tests: processed-dir resolution, config loading, colored logging."""

import logging

import pytest
import yaml

from instacart_next_order_recommendation_tpu.utils import (
    resolve_processed_dir,
    setup_colored_logging,
)
from instacart_next_order_recommendation_tpu.utils.config import (
    load_yaml_config,
    resolve_project_path,
)
from instacart_next_order_recommendation_tpu.constants import PROJECT_ROOT


class TestResolveProcessedDir:
    def test_direct_hit(self, tmp_path):
        (tmp_path / "train_dataset").mkdir()
        resolved, msg = resolve_processed_dir(tmp_path, tmp_path / "other_default")
        assert resolved == tmp_path
        assert msg is None

    def test_single_subdir_autoselect(self, tmp_path):
        sub = tmp_path / "p5_mp20_ef0.1"
        (sub / "train_dataset").mkdir(parents=True)
        resolved, msg = resolve_processed_dir(tmp_path, tmp_path)
        assert resolved == sub
        assert "p5_mp20_ef0.1" in msg

    def test_multiple_subdirs_picks_latest(self, tmp_path):
        import os
        import time

        old = tmp_path / "p5_mp20_ef0.1"
        new = tmp_path / "p3_mp10_ef0.2"
        (old / "train_dataset").mkdir(parents=True)
        (new / "train_dataset").mkdir(parents=True)
        past = time.time() - 1000
        os.utime(old / "train_dataset", (past, past))
        resolved, msg = resolve_processed_dir(tmp_path, tmp_path)
        assert resolved == new
        assert "latest" in msg

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            resolve_processed_dir(tmp_path / "nope", tmp_path / "default")

    def test_non_default_dir_no_autoselect(self, tmp_path):
        sub = tmp_path / "p5"
        (sub / "train_dataset").mkdir(parents=True)
        with pytest.raises(FileNotFoundError):
            resolve_processed_dir(tmp_path, tmp_path / "different_default")


class TestConfigLoading:
    def test_load_yaml(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump({"a": 1, "b": "x"}))
        assert load_yaml_config(p, tmp_path / "default.yaml") == {"a": 1, "b": "x"}

    def test_empty_file_gives_empty_dict(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("")
        assert load_yaml_config(p, p) == {}

    def test_missing_default_gives_empty_dict(self, tmp_path):
        assert load_yaml_config(None, tmp_path / "absent.yaml") == {}

    def test_resolve_project_path(self, tmp_path):
        assert resolve_project_path(None, tmp_path) == tmp_path
        assert resolve_project_path("/abs/x", tmp_path).as_posix() == "/abs/x"
        assert resolve_project_path("rel/x", tmp_path) == PROJECT_ROOT / "rel/x"


def test_colored_logging_configures_root(capsys):
    setup_colored_logging(quiet_loggers=["noisy.thing"])
    assert logging.getLogger("noisy.thing").level == logging.WARNING
    assert len(logging.root.handlers) == 1
    logging.getLogger("x").info("hello-world")
    captured = capsys.readouterr()
    assert "hello-world" in captured.err


class TestDotenv:
    def test_load_and_precedence(self, tmp_path, monkeypatch):
        from instacart_next_order_recommendation_tpu.utils.dotenv import load_dotenv

        env_file = tmp_path / ".env"
        env_file.write_text(
            "# comment\nAPI_KEY=fromfile\nQUOTED='hello world'\nEMPTY=\nNOEQ\n"
        )
        monkeypatch.setenv("API_KEY", "fromenv")
        monkeypatch.delenv("QUOTED", raising=False)
        parsed = load_dotenv(env_file)
        assert parsed["API_KEY"] == "fromfile"
        import os

        assert os.environ["API_KEY"] == "fromenv"  # existing env wins
        assert os.environ["QUOTED"] == "hello world"

    def test_missing_file_noop(self, tmp_path):
        from instacart_next_order_recommendation_tpu.utils.dotenv import load_dotenv

        assert load_dotenv(tmp_path / "absent.env") == {}
