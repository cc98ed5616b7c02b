"""Tests for the gin-compatible config parser."""

import pytest

from hidvae_tpu.data.processed import RecDataset
from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.utils.ginlite import bind_to_kwargs, parse_gin_file


def write(tmp_path, text):
    p = tmp_path / "cfg.gin"
    p.write_text(text)
    return str(p)


class TestParsing:
    def test_scalars_and_strings(self, tmp_path):
        cfg = parse_gin_file(write(tmp_path, """
import data.processed
train.iterations = 100      # trailing comment
train.learning_rate = 2.8e-4
train.name = "hello"
train.other = 'single'
train.flag = True
train.none_val = None
"""))
        t = cfg["train"]
        assert t["iterations"] == 100
        assert t["learning_rate"] == 2.8e-4
        assert t["name"] == "hello" and t["other"] == "single"
        assert t["flag"] is True and t["none_val"] is None

    def test_multiline_list(self, tmp_path):
        cfg = parse_gin_file(write(tmp_path, """
train.dims = [512,
              256,
              128]
"""))
        assert cfg["train"]["dims"] == [512, 256, 128]

    def test_enum_resolution_by_reference_paths(self, tmp_path):
        cfg = parse_gin_file(write(tmp_path, """
train.mode = %modules.quantize.QuantizeForwardMode.STE
train.ds = %data.tags_processed.RecDataset.KUAIRAND
train.ds2 = %QuantizeForwardMode.GUMBEL_SOFTMAX
"""))
        t = cfg["train"]
        assert t["mode"] == QuantizeForwardMode.STE
        assert t["ds"] == RecDataset.KUAIRAND
        assert t["ds2"] == QuantizeForwardMode.GUMBEL_SOFTMAX

    def test_unknown_enum_raises(self, tmp_path):
        with pytest.raises(ValueError, match="Unknown enum"):
            parse_gin_file(write(tmp_path, "train.x = %no.such.Enum.VALUE\n"))

    def test_malformed_line_raises_with_line(self, tmp_path):
        with pytest.raises(ValueError, match="Cannot parse gin line"):
            parse_gin_file(write(tmp_path, "train.iterations=\n"))

    def test_bind_unknown_params_strict(self, tmp_path):
        """Unknown bindings raise (gin-config parity, ref modules/utils.py:58-62);
        strict=False downgrades to a warning and filters."""
        cfg = parse_gin_file(write(tmp_path, """
train.a = 1
train.nonexistent_param_xyz = 2
"""))

        def fn(a=0):
            return a

        with pytest.raises(ValueError, match="nonexistent_param_xyz"):
            bind_to_kwargs(cfg, "train", fn)
        assert bind_to_kwargs(cfg, "train", fn, strict=False) == {"a": 1}


class TestLLMPoolLocal:
    def test_least_used_selection(self):
        from hidvae_tpu.data.llm_tags import LLMEndpoint, LLMPool

        eps = [LLMEndpoint("http://a"), LLMEndpoint("http://b")]
        pool = LLMPool(eps, strategy="least_used")
        e1 = pool._pick()
        e2 = pool._pick()
        assert {e1.base_url, e2.base_url} == {"http://a", "http://b"}
        pool._release(e1)
        assert pool._pick() is e1  # released one is least used again

    def test_round_robin(self):
        from hidvae_tpu.data.llm_tags import LLMEndpoint, LLMPool

        eps = [LLMEndpoint("http://a"), LLMEndpoint("http://b")]
        pool = LLMPool(eps, strategy="round_robin")
        urls = [pool._pick().base_url for _ in range(4)]
        assert urls == ["http://a", "http://b", "http://a", "http://b"]

    def test_json_extraction(self):
        from hidvae_tpu.data.llm_tags import _extract_json

        assert _extract_json('noise {"a": 1} trailing') == {"a": 1}
        with pytest.raises(ValueError):
            _extract_json("no json here")
