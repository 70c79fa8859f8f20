"""Golden DCSO-codec fixture (FIXTURES.md F2 last bullet): a checked-in
filter blob pins the byte format — any change to the FNV kernels, parameter
derivation, bit layout, or serialization breaks these assertions."""

import hashlib
import os

import numpy as np

from fever_ray.sketches.bloom import BloomFilter

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.bloom")
FIXTURE_GZ = FIXTURE + ".gz"

GOLDEN_SHA1 = "9c75565d6b03cbfc022aab5e3d0953495e629117"


def _planted():
    return [f"ioc-{i}.example.com" for i in range(100)] + [
        "/oddlyspecific",
        "foo.bar.de/odd",
        "http://foo.bar.de/odd",
    ]


def test_golden_blob_loads_with_pinned_params():
    bf = BloomFilter.load(FIXTURE)
    assert (bf.n, bf.p, bf.k, bf.m, bf.N) == (1000, 0.0001, 14, 19170, 103)
    assert bf.data == b"fever_ray golden fixture v1"
    assert bf.check(_planted()).all()
    assert not bf.check_one("definitely-not-planted.example.org")


def test_golden_blob_gzip_variant():
    bf = BloomFilter.load(FIXTURE_GZ, compressed=True)
    plain = BloomFilter.load(FIXTURE)
    assert np.array_equal(bf.v, plain.v)
    assert bf.data == plain.data


def test_rebuilding_reproduces_identical_bytes():
    """The codec + hashing must regenerate the fixture bit-for-bit."""
    bf = BloomFilter.initialize(1000, 0.0001)
    bf.add(_planted()[:100])
    bf.add(_planted()[100:])
    bf.data = b"fever_ray golden fixture v1"
    assert hashlib.sha1(bf.to_bytes()).hexdigest() == GOLDEN_SHA1
    with open(FIXTURE, "rb") as fh:
        assert fh.read() == bf.to_bytes()


def test_cli_add_then_save_roundtrip_matches_build_at_once(tmp_path):
    """`bloom add` on an existing filter file (the mgmt BloomAdd analog,
    /root/reference/mgmt/mgmtserver.go:118-160): incremental add-then-save
    must produce the byte-identical DCSO layout of a filter built with all
    values at once."""
    from fever_ray import cli as cli_mod

    first, extra = _planted()[:80], _planted()[80:]
    f_inc = str(tmp_path / "inc.bloom")
    bf = BloomFilter.initialize(1000, 0.0001)
    bf.add(first)
    bf.save(f_inc)

    iocs = tmp_path / "extra.txt"
    iocs.write_text("".join(v + "\n" for v in extra))
    rc = cli_mod.main(["bloom", "add", f_inc, "--iocs", str(iocs)])
    assert rc == 0

    ref = BloomFilter.initialize(1000, 0.0001)
    ref.add(_planted())
    got = open(f_inc, "rb").read()
    assert got == ref.to_bytes()
    # and the grown filter still answers membership correctly
    bf2 = BloomFilter.load(f_inc)
    assert bf2.check(_planted()).all()
    assert bf2.N == len(_planted())


def test_add_then_save_on_golden_fixture(tmp_path):
    """Adding to the GOLDEN fever-written file and saving must preserve the
    DCSO layout: reload sees old + new members with pinned params."""
    import shutil

    from fever_ray import cli as cli_mod

    work = str(tmp_path / "work.bloom")
    shutil.copy(FIXTURE, work)
    rc = cli_mod.main(["bloom", "add", work, "new-ioc.example.org"])
    assert rc == 0
    bf = BloomFilter.load(work)
    assert (bf.n, bf.p, bf.k, bf.m) == (1000, 0.0001, 14, 19170)
    assert bf.N == 104  # golden 103 + 1
    assert bf.check(_planted()).all()
    assert bf.check_one("new-ioc.example.org")
    assert bf.data == b"fever_ray golden fixture v1"


def test_cli_cbloom_retraction_lifecycle(tmp_path, capsys):
    """cbloom create → add → remove → check: retraction without rebuild —
    removed indicators stop matching, surviving ones keep matching (no
    false negatives), and the artifact round-trips through the file."""
    import json as _json

    from fever_ray import cli as cli_mod

    iocs = tmp_path / "iocs.txt"
    iocs.write_text("evil-a.net\nevil-b.org\nevil-c.com\n")
    f = str(tmp_path / "ind.cbf")
    assert cli_mod.main(["cbloom", "create", f, "--iocs", str(iocs),
                         "--capacity", "1000"]) == 0
    assert cli_mod.main(["cbloom", "add", f, "late-ioc.example"]) == 0
    assert cli_mod.main(["cbloom", "remove", f, "evil-b.org"]) == 0
    capsys.readouterr()

    assert cli_mod.main(["cbloom", "check", f, "evil-a.net", "evil-b.org",
                         "evil-c.com", "late-ioc.example", "benign.net"]) == 0
    got = dict(
        line.split("\t") for line in capsys.readouterr().out.strip().splitlines()
    )
    assert got == {
        "evil-a.net": "True",
        "evil-b.org": "False",
        "evil-c.com": "True",
        "late-ioc.example": "True",
        "benign.net": "False",
    }

    assert cli_mod.main(["cbloom", "show", f]) == 0
    card = _json.loads(capsys.readouterr().out)
    assert card["n_add"] == 4 and card["n_remove"] == 1 and card["debt"] == 0
