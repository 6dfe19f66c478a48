"""RCSB fetcher (io/fetch.py) against a localhost HTTP server — no real
network. Covers found-gzip / plain-fallback / bad-gzip / missing, the
sharded-mirror fetcher, and the rotamer-tagger + resolver wiring
(reference analyse_utils.py:947-961)."""
import functools
import gzip
import http.server
import threading
from pathlib import Path

import pytest

from timed_design_tpu.analyse.rotamer import (
    resolve_structure_paths,
    tag_structures_with_rotamers,
)
from timed_design_tpu.io.fetch import fetch_pdb, make_fetcher


@pytest.fixture(scope="module")
def pdb_server(tmp_path_factory, ubq_pdb_gz):
    """Localhost HTTP server with: 1ubq.pdb1.gz (good gzip), 9abc.pdb1
    (plain only), 2bad.pdb1.gz (NOT gzip) + 2bad.pdb1 (plain)."""
    docroot = tmp_path_factory.mktemp("rcsb")
    raw = ubq_pdb_gz.read_bytes()
    plain = gzip.decompress(raw)
    (docroot / "1ubq.pdb1.gz").write_bytes(raw)
    (docroot / "9abc.pdb1").write_bytes(plain)
    (docroot / "2bad.pdb1.gz").write_bytes(b"this is not gzip data")
    (docroot / "2bad.pdb1").write_bytes(plain)

    class QuietHandler(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a, **k):
            pass

    handler = functools.partial(QuietHandler, directory=str(docroot))
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/"
    server.shutdown()


def test_fetch_found_gzip(pdb_server, tmp_path):
    out = fetch_pdb("1UBQ", tmp_path, base_url=pdb_server, verbosity=0)
    assert out == tmp_path / "1ubq.pdb1.gz"
    from timed_design_tpu.structure import load_pdb

    assert load_pdb(out).n_residues == 76


def test_fetch_plain_fallback(pdb_server, tmp_path):
    out = fetch_pdb("9abc", tmp_path, base_url=pdb_server, verbosity=0)
    assert out == tmp_path / "9abc.pdb1"
    from timed_design_tpu.structure import load_pdb

    assert load_pdb(out).n_residues == 76


def test_fetch_bad_gzip_falls_through(pdb_server, tmp_path):
    """A .gz response without the gzip magic must not poison the mirror —
    the plain candidate is used instead."""
    out = fetch_pdb("2bad", tmp_path, base_url=pdb_server, verbosity=0)
    assert out == tmp_path / "2bad.pdb1"
    assert not (tmp_path / "2bad.pdb1.gz").exists()


def test_fetch_missing_raises(pdb_server, tmp_path):
    with pytest.raises(FileNotFoundError, match="0zzz"):
        fetch_pdb("0zzz", tmp_path, base_url=pdb_server, verbosity=0)


def test_make_fetcher_shards_like_the_reference(pdb_server, tmp_path):
    """make_fetcher writes into pdb_dir/<code[1:3]>/ — the reference's
    mirror layout (analyse_utils.py:952-954) — so the next
    resolve_structure_paths finds the file locally with no fetch."""
    fetcher = make_fetcher(tmp_path, base_url=pdb_server)
    out = fetcher("1ubq")
    assert out == tmp_path / "ub" / "1ubq.pdb1.gz"

    resolved = resolve_structure_paths(["1ubqA"], tmp_path, fetcher=None)
    assert resolved["1ubq"] == out


def test_resolver_fetches_misses_and_isolates_failures(pdb_server, tmp_path):
    fetcher = make_fetcher(tmp_path, base_url=pdb_server)
    resolved = resolve_structure_paths(["1ubqA", "0zzzB"], tmp_path,
                                       fetcher=fetcher)
    assert resolved["1ubq"] is not None and resolved["1ubq"].exists()
    assert resolved["0zzz"] is None  # failed fetch maps to None, no raise


def test_tagger_fetches_none_paths(pdb_server, tmp_path):
    """tag_structures_with_rotamers resolves None paths through the
    injectable fetcher (the reference's _fetch_pdb call site,
    analyse_utils.py:964); a still-missing code is skipped, not fatal."""
    fetcher = make_fetcher(tmp_path, base_url=pdb_server)
    tags, assemblies = tag_structures_with_rotamers(
        {"1ubq": None, "0zzz": None}, fetcher=fetcher
    )
    assert "1ubq" in assemblies
    assert "1ubqA" in tags and len(tags["1ubqA"]) == 76
    assert "0zzz" not in assemblies

    # without a fetcher, None paths are skipped with the reference message
    tags2, assemblies2 = tag_structures_with_rotamers({"1ubq": None})
    assert tags2 == {} and assemblies2 == {}


def test_resolver_finds_sharded_plain_pdb(tmp_path, ubq_pdb_gz):
    """fetch_pdb's third fallback saves <shard>/{code}.pdb — the resolver
    must find it on the next run instead of re-downloading forever."""
    import gzip as _gzip

    shard = tmp_path / "ab"
    shard.mkdir()
    (shard / "7abc.pdb").write_bytes(_gzip.decompress(ubq_pdb_gz.read_bytes()))
    resolved = resolve_structure_paths(["7abcA"], tmp_path)
    assert resolved["7abc"] == shard / "7abc.pdb"


def test_resolver_fetches_each_code_once(tmp_path):
    """Chain keys of one structure collapse to ONE fetch attempt — a dead
    6-chain code must not stall on the network six times."""
    calls = []

    def fetcher(code):
        calls.append(code)
        raise FileNotFoundError("dead code")

    resolved = resolve_structure_paths(
        ["0zzzA", "0zzzB", "0zzzC"], tmp_path, fetcher=fetcher
    )
    assert resolved["0zzz"] is None
    assert calls == ["0zzz"]


def test_fetcher_rejects_html_error_pages(tmp_path):
    """A proxy answering 200 with an HTML error page must not poison the
    mirror: the non-gz candidates get content-validated too, and nothing
    is written for any candidate."""
    from timed_design_tpu.io.fetch import fetch_pdb

    def opener(url):
        if url.endswith(".gz"):
            raise OSError("404")
        return b"<html><body>Rate limit exceeded</body></html>"

    with pytest.raises(FileNotFoundError, match="no PDB records"):
        fetch_pdb("9xyz", tmp_path, opener=opener)
    assert list(tmp_path.iterdir()) == []


def test_fetcher_rejects_gzipped_html(tmp_path):
    """A gzip-COMPRESSED error page passes the magic check but must still
    be rejected: the decompressed head gets the same PDB-record test."""
    import gzip as _gzip

    from timed_design_tpu.io.fetch import fetch_pdb

    def opener(url):
        return _gzip.compress(b"<html>Too many requests</html>")

    with pytest.raises(FileNotFoundError, match="no PDB records"):
        fetch_pdb("9xyz", tmp_path, opener=opener)
    assert list(tmp_path.iterdir()) == []
