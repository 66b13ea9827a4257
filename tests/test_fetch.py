"""S7 model fetch (sources/fetch.py) — reference fasttext_wrapper.py:13-33
semantics: lazy download, skip-if-cached, prefer-big/fallback-tiny. Driven
against a real loopback HTTP server plus the synthetic on-format fastText
fixture so fetch -> load -> predict runs end-to-end with zero network."""

import functools
import hashlib
import threading
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest

from language_identification_spark.operators.fasttext_np import load_model
from language_identification_spark.sources.fetch import ensure_model, fetch_file

from test_fasttext_np import _build_model


@pytest.fixture()
def model_file(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    path, *_ = _build_model(src)
    return path


@pytest.fixture()
def http_root(tmp_path, model_file):
    root = tmp_path / "www"
    root.mkdir()
    (root / "lid.synthetic.bin").write_bytes(open(model_file, "rb").read())
    handler = functools.partial(SimpleHTTPRequestHandler, directory=str(root))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", root
    srv.shutdown()


def _sha(p):
    return hashlib.sha256(open(p, "rb").read()).hexdigest()


def test_fetch_http_and_cache(http_root, tmp_path, model_file):
    base, root = http_root
    dest = tmp_path / "cache" / "model.bin"
    got = fetch_file(f"{base}/lid.synthetic.bin", dest, sha256=_sha(model_file))
    assert got == dest and _sha(dest) == _sha(model_file)
    # cache hit: serve nothing, still resolves (url never touched)
    (root / "lid.synthetic.bin").unlink()
    assert fetch_file(f"{base}/lid.synthetic.bin", dest) == dest
    # no tmp litter
    assert list(dest.parent.glob("*.tmp-fetch")) == []


def test_fetched_model_predicts(http_root, tmp_path):
    base, _ = http_root
    dest = tmp_path / "model.bin"
    fetch_file(f"{base}/lid.synthetic.bin", dest)
    model = load_model(str(dest))
    preds = [
        model.predict(t, k=1)[0][0]
        for t in ["hello world", "bonjour le monde"]
    ]
    assert preds == ["__label__en", "__label__fr"]


def test_sha_mismatch_is_loud_and_leaves_nothing(http_root, tmp_path):
    base, _ = http_root
    dest = tmp_path / "model.bin"
    with pytest.raises(ValueError, match="sha256"):
        fetch_file(f"{base}/lid.synthetic.bin", dest, sha256="0" * 64)
    assert not dest.exists()
    assert list(tmp_path.glob("*.tmp-fetch")) == []


def test_corrupt_cache_fails_pin(tmp_path):
    dest = tmp_path / "model.bin"
    dest.write_bytes(b"partial garbage")
    with pytest.raises(ValueError, match="cached"):
        fetch_file("http://unused.invalid/x", dest, sha256="0" * 64)


def test_http_404_leaves_nothing(http_root, tmp_path):
    base, _ = http_root
    dest = tmp_path / "model.bin"
    with pytest.raises(OSError):
        fetch_file(f"{base}/absent.bin", dest)
    assert not dest.exists() and list(tmp_path.glob("*.tmp-fetch")) == []


def test_ensure_model_prefers_big(tmp_path, model_file):
    tiny = tmp_path / "tiny.ftz"
    tiny.write_bytes(b"tiny")
    # big exists -> big, tiny untouched
    assert ensure_model(model_file, tiny_path=tiny) == __import__(
        "pathlib"
    ).Path(model_file)


def test_ensure_model_fallback_tiny(tmp_path):
    tiny = tmp_path / "tiny.ftz"
    tiny.write_bytes(b"tiny")
    # big absent, no url -> tiny fallback (fasttext_wrapper.py:30-33)
    assert ensure_model(tmp_path / "big.bin", tiny_path=tiny) == tiny
    # neither -> loud (the reference asserts)
    with pytest.raises(FileNotFoundError):
        ensure_model(tmp_path / "big.bin")


def test_ensure_model_fetches_then_falls_back(http_root, tmp_path, model_file):
    base, _ = http_root
    big = tmp_path / "big.bin"
    got = ensure_model(big, url=f"{base}/lid.synthetic.bin")
    assert got == big and _sha(big) == _sha(model_file)
    # bad url + tiny present -> fallback instead of raise
    tiny = tmp_path / "tiny.ftz"
    tiny.write_bytes(b"tiny")
    assert (
        ensure_model(tmp_path / "other.bin", url=f"{base}/absent.bin", tiny_path=tiny)
        == tiny
    )
    # bad url + no tiny -> raise
    with pytest.raises(OSError):
        ensure_model(tmp_path / "other.bin", url=f"{base}/absent.bin")


def test_pin_failure_stays_fatal_even_with_tiny(http_root, tmp_path):
    """A sha256 pin mismatch on a fresh download is an INTEGRITY failure —
    it must raise even when a tiny fallback exists (only unavailability
    falls back); silently running the low-quality model against a
    corrupted mirror is exactly what the pin exists to prevent."""
    base, _ = http_root
    tiny = tmp_path / "tiny.ftz"
    tiny.write_bytes(b"tiny")
    big = tmp_path / "big.bin"
    with pytest.raises(ValueError, match="sha256"):
        ensure_model(
            big,
            url=f"{base}/lid.synthetic.bin",
            sha256="0" * 64,
            tiny_path=tiny,
        )
    assert not big.exists()  # nothing cached from the failed fetch
