"""The gated real-fastText path (S6/L1), exercised with an injected fake
``fasttext`` module: the native library is absent in this sandbox, so these
tests verify OUR plumbing — gating logic, per-executor singleton keyed by
model path, batch predict wiring, __label__ stripping — against a
deterministic stand-in implementing the public fasttext API shape
(load_model(path).predict(list[str], k) -> (labels, probs))."""

import sys
import types

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def fake_fasttext(monkeypatch, tmp_path):
    calls = {"loads": []}

    class _FakeModel:
        def __init__(self, path):
            self.path = path

        def predict(self, texts, k=1):
            labels, probs = [], []
            for t in texts:
                if "bonjour" in t:
                    labels.append(["__label__fr"])
                    probs.append([0.97])
                elif t.strip():
                    labels.append(["__label__en"])
                    probs.append([0.85])
                else:
                    labels.append([])
                    probs.append([])
            return labels, probs

    mod = types.ModuleType("fasttext")

    def load_model(path):
        calls["loads"].append(path)
        return _FakeModel(path)

    mod.load_model = load_model
    monkeypatch.setitem(sys.modules, "fasttext", mod)
    model_file = tmp_path / "lid.176.ftz"
    model_file.write_bytes(b"fake")
    monkeypatch.setenv("FASTTEXT_MODEL_PATH", str(model_file))
    # the singleton must not leak across tests
    from language_identification_spark.operators import lid

    monkeypatch.setattr(lid, "_FASTTEXT_SINGLETON", {})
    return calls, str(model_file)


def test_gating_logic(monkeypatch):
    from language_identification_spark.operators.lid import fasttext_available

    monkeypatch.delenv("FASTTEXT_MODEL_PATH", raising=False)
    assert fasttext_available() is False  # no lib and/or no model path


def test_fasttext_available_with_fake(fake_fasttext):
    from language_identification_spark.operators.lid import fasttext_available

    assert fasttext_available() is True


def test_availability_probes_header_without_native_lib(monkeypatch, tmp_path):
    """With no native lib, availability is decided by the 64-byte header
    probe, not the file extension: a real supervised model is available, a
    same-extension junk file is not (it would throw in every task)."""
    from test_fasttext_np import _build_model

    from language_identification_spark.operators.lid import fasttext_available

    monkeypatch.setitem(sys.modules, "fasttext", None)  # import -> ImportError
    path, *_ = _build_model(tmp_path)
    monkeypatch.setenv("FASTTEXT_MODEL_PATH", path)
    assert fasttext_available() is True
    junk = tmp_path / "lid.176.ftz"
    junk.write_bytes(b"not a model")
    monkeypatch.setenv("FASTTEXT_MODEL_PATH", str(junk))
    assert fasttext_available() is False


FAKE_FASTTEXT_SRC = '''\
"""Deterministic stand-in for the fasttext package (test-only), implementing
the public API shape the engine uses: load_model(path).predict(texts, k).

addPyFile is SESSION-PERMANENT: every later worker task in the shared test
Spark session resolves `import fasttext` to this module. So for REAL model
files (correct magic) it delegates to the numpy engine — identical
behavior to no-fake-present — and only canned-answers the junk file the
plumbing test feeds it. Without the delegation, every fastText test that
runs after this one in the suite would silently score with the fake.
"""
import struct


class _FakeModel:
    def __init__(self, path):
        self.path = path

    def predict(self, texts, k=1):
        labels, probs = [], []
        for t in texts:
            if "bonjour" in t:
                labels.append(["__label__fr"])
                probs.append([0.97])
            elif t.strip():
                labels.append(["__label__en"])
                probs.append([0.85])
            else:
                labels.append([])
                probs.append([])
        return labels, probs


def load_model(path):
    try:
        with open(path, "rb") as f:
            (magic,) = struct.unpack("<i", f.read(4))
    except (OSError, struct.error):
        magic = None
    if magic == 793712314:  # a real fastText file: behave like the engine
        from language_identification_spark.operators.fasttext_np import (
            NativeApiShim,
        )
        from language_identification_spark.operators.fasttext_np import (
            load_model as _np_load,
        )

        return NativeApiShim(_np_load(path))
    return _FakeModel(path)
'''


def test_fasttext_udf_plumbing(spark, fake_fasttext, tmp_path):
    """Batch predict through the real UDF in REAL python workers: the fake
    module ships to executors via addPyFile (exactly how a dependency
    reaches workers under spark-submit --py-files), labels stripped, confs
    surfaced, empty texts -> (None, 0.0)."""
    calls, path = fake_fasttext
    mod_file = tmp_path / "fasttext.py"
    mod_file.write_text(FAKE_FASTTEXT_SRC)
    spark.sparkContext.addPyFile(str(mod_file))
    from language_identification_spark.operators.lid import fasttext_lid_udf

    df = spark.createDataFrame(
        [("bonjour le monde",), ("hello world",), ("",)], "text string"
    )
    rows = (
        df.repartition(1)
        .select(fasttext_lid_udf()(F.col("text")).alias("r"))
        .collect()
    )
    got = sorted(
        ((r["r"]["lang"], round(r["r"]["conf"], 2)) for r in rows),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [("en", 0.85), ("fr", 0.97), (None, 0.0)]


def test_fasttext_singleton_keyed_by_path(fake_fasttext):
    calls, path = fake_fasttext
    from language_identification_spark.operators.lid import _load_fasttext

    m1 = _load_fasttext(path)
    m2 = _load_fasttext(path)
    assert m1 is m2
    assert calls["loads"] == [path]  # loaded exactly once
