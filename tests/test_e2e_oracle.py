"""End-to-end accuracy oracle with trained synthetic weights.

Port of the reference's own test strategy (session.rs:186-255): render
text with a font, optionally rotate the whole image 180 degrees, run the
full det -> cls -> rec pipeline, and assert the detected box, the cls
label, and the recognized text.  Skipped when trained_weights/ is absent.
"""

import difflib
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "trained_weights"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (WEIGHTS / "rec.npz").exists() or not (WEIGHTS / "det.npz").exists(),
        reason="trained weights not present",
    ),
]


@pytest.fixture(scope="module")
def session():
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig()  # reference defaults incl. cls.thresh 0.9
    return RettoSession(
        cfg,
        preset="mobile",
        charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )


def render(text: str, w=640, h=200, size=44, xy=(30, 70)):
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size
    )
    img = Image.new("RGB", (w, h), (255, 255, 255))
    d = ImageDraw.Draw(img)
    d.text(xy, text, font=font, fill=(0, 0, 0))
    bbox = d.textbbox(xy, text, font=font)
    return np.asarray(img, dtype=np.uint8), bbox  # (l, t, r, b)


def similarity(a: str, b: str) -> float:
    return difflib.SequenceMatcher(None, a, b).ratio()


def test_upright_text_recognized(session):
    # the reference's own bar (session.rs:206-229): detected-box BR corner
    # within 10 px of the true text extent, recognized text EXACTLY equal
    text = "Hello World 123"
    img, bbox = render(text)
    res = session.run(img)
    assert len(res.det_result) == 1, f"expected 1 box, got {len(res.det_result)}"
    box = res.det_result[0].box
    assert abs(box.br.x - bbox[2]) <= 10 and abs(box.br.y - bbox[3]) <= 10, (
        box, bbox
    )
    assert res.cls_result[0].label == 0
    got = res.rec_result[0].text
    assert got == text, f"{got!r} != {text!r}"


def test_rotated_image_cls_and_rec(session):
    # the reference's test_small_image: whole image rotated 180
    # (session.rs:201-204, 226), cls must say 180 (at the default 0.9
    # threshold) and rec must read the exact text
    text = "Hello World 123"
    img, _ = render(text)
    res = session.run(img[::-1, ::-1].copy())
    assert len(res.det_result) == 1
    assert res.cls_result[0].label == 180
    assert res.cls_result[0].score >= 0.9
    got = res.rec_result[0].text
    assert got == text, f"{got!r} != {text!r}"


def test_large_image(session):
    # the reference's test_large_image (session.rs:231-255): the same
    # oracle at 7680x4320 with a 100 px corner tolerance — a regression
    # test for the big-image resize chain (resize_both 2000/30 then det)
    from PIL import Image, ImageDraw, ImageFont

    text = "Hello World 123"
    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 260
    )
    img = Image.new("RGB", (7680, 4320), (255, 255, 255))
    d = ImageDraw.Draw(img)
    xy = (400, 1900)
    d.text(xy, text, font=font, fill=(0, 0, 0))
    bbox = d.textbbox(xy, text, font=font)
    res = session.run(np.asarray(img, dtype=np.uint8))
    assert len(res.det_result) == 1
    box = res.det_result[0].box  # reported in ORIGINAL image coords
    assert abs(box.br.x - bbox[2]) <= 100 and abs(box.br.y - bbox[3]) <= 100, (
        box, bbox
    )
    got = res.rec_result[0].text
    assert got == text, f"{got!r} != {text!r}"


def test_large_type_no_fragmentation(session):
    # r4 regression: the min-side-736 det upscale puts a 44 px line on a
    # 200 px-tall page at ~160 px in det coordinates; before the
    # large-type curriculum (tools/train_synthetic.py render_det_dataset)
    # the det under-painted wide word gaps at that scale and fragmented
    # '2203 3478 side' into per-word-group boxes
    text = "2203 3478 side"
    img, bbox = render(text)
    res = session.run(img)
    assert len(res.det_result) == 1, (
        f"large-type line fragmented into {len(res.det_result)} boxes"
    )
    box = res.det_result[0].box
    assert abs(box.br.x - bbox[2]) <= 10 and abs(box.br.y - bbox[3]) <= 10, (
        box, bbox
    )
    got = res.rec_result[0].text
    assert got == text, f"{got!r} != {text!r}"


def test_stream_cross_batch_accumulation(session):
    # stream() pipelines two deep and lets batch i's underfull rec
    # size-class buckets absorb batch i+1's crops (cross-BATCH crop
    # accumulation, VERDICT r3 item 4).  The semantic invariant: texts
    # and box counts are EXACTLY what back-to-back run_many produces,
    # in order, on mixed page sizes (several accumulator keys).
    texts = ["open", "9310 let", "total 42", "week", "price 7", "turn"]
    batches = []
    for bi in range(3):
        batch = []
        for ti, t in enumerate(texts[bi * 2: bi * 2 + 2]):
            w, h = [(640, 200), (512, 160)][ti % 2]
            img, _ = render(t, w=w, h=h, size=36, xy=(20, 60))
            batch.append(img)
        batches.append(batch)
    dp = session.device_pipeline()
    seq = [dp.run_many(b) for b in batches]
    got = list(dp.stream(batches))
    assert len(got) == len(seq)
    for rs, rg in zip(seq, got):
        for a, b in zip(rs, rg):
            assert [t.text for t in a.rec_result] == [
                t.text for t in b.rec_result
            ]
            assert len(a.det_result) == len(b.det_result)


def test_multiline_reading_order(session):
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 40
    )
    lines = ["happy dog", "quick brown", "jumping high"]
    img = Image.new("RGB", (720, 360), (255, 255, 255))
    d = ImageDraw.Draw(img)
    for i, t in enumerate(lines):
        d.text((30, 30 + 110 * i), t, font=font, fill=(0, 0, 0))
    res = session.run(np.asarray(img, dtype=np.uint8))
    assert len(res.det_result) == 3
    # reading order: top to bottom
    ys = [b.box.tl.y for b in res.det_result]
    assert ys == sorted(ys)
    sims = [
        similarity(t.text, ref) for t, ref in zip(res.rec_result, lines)
    ]
    # orientation can legitimately be ambiguous for isolated short strings;
    # require at least 2 of 3 lines read well and none empty
    good = sum(s >= 0.7 for s in sims)
    assert good >= 2, list(zip([t.text for t in res.rec_result], lines))
    assert all(t.text for t in res.rec_result)


@pytest.fixture(scope="module")
def session_nocls():
    # path-equivalence is asserted with cls disabled so a cls judgment
    # difference (model quality, not path correctness) cannot flip a crop
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig(use_cls=False)
    return RettoSession(
        cfg,
        preset="mobile",
        charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )


def test_device_pipeline_matches_staged(session_nocls):
    # the fused fast path must produce equivalent texts to the staged path
    text = "Match Paths 99"
    img, _ = render(text)
    staged = session_nocls.run(img)
    fused = session_nocls.device_pipeline().run(img)
    assert len(fused.det_result) == len(staged.det_result) == 1
    # det boxes agree within a few px
    np.testing.assert_allclose(
        fused.det_result[0].box.pts, staged.det_result[0].box.pts, atol=4
    )
    s_txt = staged.rec_result[0].text
    f_txt = fused.rec_result[0].text
    assert s_txt == f_txt == text, (s_txt, f_txt, text)


def test_device_pipeline_yuv420_transfer(session_nocls):
    """yuv420 transfer (image/yuv.py) must not change the read text —
    rendered text is luma-dominant, and JPEG sources are 4:2:0 anyway."""
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict

    text = "Chroma Safe 42"
    img, _ = render(text)
    base = session_nocls.device_pipeline().run(img)

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig(use_cls=False)
    cfg.engine.transfer_format = "yuv420"
    s_yuv = RettoSession(
        cfg,
        preset="mobile",
        charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    got = s_yuv.device_pipeline().run(img)
    assert len(got.det_result) == len(base.det_result) == 1
    np.testing.assert_allclose(
        got.det_result[0].box.pts, base.det_result[0].box.pts, atol=4
    )
    assert got.rec_result[0].text == base.rec_result[0].text


def test_chunked_wide_line(session_nocls):
    """Very wide lines split into overlapping segments (the long-context
    analog — SURVEY.md §5): capping the width buckets must not change the
    text read by the fused pipeline."""
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.config import BucketConfig
    from retto_tpu.ops.charset import CharacterDict

    text = "the quick brown fox jumps over the dog"
    img, _ = render(text, w=1600, h=140, size=40, xy=(20, 40))
    base = session_nocls.device_pipeline().run(img)
    base_text = base.rec_result[0].text

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig(use_cls=False)
    cfg.buckets = BucketConfig(rec_width_buckets=(192, 320, 512))
    s_chunk = RettoSession(
        cfg,
        preset="mobile",
        charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    got = s_chunk.device_pipeline().run(img)
    assert len(got.det_result) == 1
    got_text = got.rec_result[0].text
    # the wide line must have actually been chunked (width ratio >> 512/48)
    assert similarity(got_text, base_text) >= 0.9, (got_text, base_text)
    assert similarity(got_text, text) >= 0.9, (got_text, text)


@pytest.mark.skipif(
    not (WEIGHTS / "rec_big.npz").exists(),
    reason="big-vocab checkpoint not present",
)
def test_bigvocab_full_pipeline():
    """The 6,625-class head through the FULL fused pipeline (VERDICT r3
    item 6): det boxes pseudo-glyph lines, cls passes them upright, rec
    reads the reference-scale dict end-to-end (rec_processor.rs:29-46)."""
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.train.bigvocab import render_big_page

    chars = CharacterDict(
        (WEIGHTS / "charset_big.txt").read_text(encoding="utf-8").splitlines()
    )
    assert chars.num_classes == 6625
    session = RettoSession(
        SessionConfig(), preset="mobile", charset=chars,
        weights={
            "det": str(WEIGHTS / "det.npz"),
            "cls": str(WEIGHTS / "cls.npz"),
            "rec": str(WEIGHTS / "rec_big.npz"),
        },
    )
    rng = np.random.default_rng(7)
    pages, gts = [], []
    while len(pages) < 2:
        img, _, texts = render_big_page(rng, 320, 512, max_lines=2,
                                        lh_range=(40, 56), max_len=6)
        if texts:
            pages.append(img)
            gts.append(texts)
    out = session.device_pipeline().run_many(pages)
    n_ok = total = 0
    got_all = []
    for res, texts in zip(out, gts):
        got = [t.text for t in res.rec_result]
        got_all.append(got)
        assert len(got) == len(texts), (got, texts)  # det boxed every line
        total += len(texts)
        n_ok += sum(g == t for g, t in zip(got, texts))
    assert n_ok >= max(1, total - 1), (got_all, gts)
