"""Interactive web surface (smithwaterman_tpu/web.py) — the equivalent of
the reference's SmithWaterman.html browser engine: all-vs-all over two
multi-FASTA boxes, settable penalties, BLOSUM62 vs match/mismatch(4,-1),
`:` match line."""

import json
import threading
import urllib.request

from smithwaterman_tpu import Aligner, LOCAL
from smithwaterman_tpu.web import Handler, align_request, ThreadingHTTPServer


def test_align_request_all_vs_all_and_match_line():
    out = align_request(
        {
            "seq1": ">a\nHEAGAWGHEE\n>b\nPAWHEAE",
            "seq2": ">c\nHEAGAWGHEF",
            "gap_open": 10,
            "gap_extend": 0.5,
            "matrix": "protein",
        }
    )
    assert len(out["results"]) == 2  # 2 x 1 all-vs-all
    r0 = out["results"][0]
    want = Aligner(mode=LOCAL).align("HEAGAWGHEE", "HEAGAWGHEF", True)
    assert r0["score"] == want.score
    assert r0["aligned1"] == want.aligned1
    assert len(r0["match"]) == len(r0["aligned1"])
    assert ":" in r0["match"]


def test_align_request_lettermatch_and_penalties():
    out = align_request(
        {
            "seq1": "ACGT",
            "seq2": "ACGT",
            "gap_open": 5,
            "gap_extend": 1,
            "matrix": "lettermatch",
        }
    )
    # perfect match under match=4: score 16 (html:62-69 semantics)
    assert out["results"][0]["score"] == 16.0


def test_align_request_bad_input():
    assert "error" in align_request({"gap_open": "xx"})


def test_http_roundtrip():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read()
        assert b"Gap Open Penalty" in page
        body = json.dumps(
            {"seq1": "HEAGAWGHEE", "seq2": "PAWHEAE"}
        ).encode()
        resp = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/align", data=body, method="POST"
            ),
            timeout=60,
        )
        data = json.loads(resp.read())
        want = Aligner(mode=LOCAL).align("HEAGAWGHEE", "PAWHEAE", True).score
        assert data["results"][0]["score"] == want
    finally:
        httpd.shutdown()
