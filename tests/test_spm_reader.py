"""Pure-Python SentencePiece .model reader vs hand-built protobufs."""

import struct

from conformer_tpu.data.spm_reader import (
    NORMAL,
    UNKNOWN,
    PureSentencePieceEncoder,
    parse_model,
)
from conformer_tpu.data.tokenizer import Tokenizer, make_piece_encoder


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _piece(piece: str, score: float, ptype: int = NORMAL) -> bytes:
    msg = (
        _ld(1, piece.encode())
        + _varint((2 << 3) | 5) + struct.pack("<f", score)
        + _varint(3 << 3) + _varint(ptype)
    )
    return _ld(1, msg)


def _trainer_spec(model_type: int) -> bytes:
    return _ld(2, _varint(3 << 3) + _varint(model_type))


def _write_model(path, pieces, model_type):
    buf = b"".join(_piece(*p) for p in pieces) + _trainer_spec(model_type)
    path.write_bytes(buf)
    return str(path)


UNIGRAM_PIECES = [
    ("<unk>", 0.0, UNKNOWN),
    ("▁HE", -1.0, NORMAL),
    ("▁HELLO", -2.0, NORMAL),
    ("LLO", -1.5, NORMAL),
    ("▁", -4.0, NORMAL),
    ("H", -5.0, NORMAL),
    ("E", -5.0, NORMAL),
    ("L", -5.0, NORMAL),
    ("O", -5.0, NORMAL),
    ("▁WORLD", -2.5, NORMAL),
]


def test_parse_model_roundtrip(tmp_path):
    path = _write_model(tmp_path / "uni.model", UNIGRAM_PIECES, 1)
    pieces, model_type = parse_model(path)
    assert model_type == 1
    assert pieces[0] == ("<unk>", 0.0, UNKNOWN)
    assert ("▁HELLO", -2.0, NORMAL) in pieces


def test_unigram_viterbi_picks_max_score_segmentation(tmp_path):
    path = _write_model(tmp_path / "uni.model", UNIGRAM_PIECES, 1)
    enc = PureSentencePieceEncoder(path)
    # "▁HELLO": whole piece scores -2.0; "▁HE"+"LLO" scores -2.5 -> whole wins
    assert enc.encode_as_pieces("HELLO") == ["▁HELLO"]
    assert enc.encode_as_pieces("HELLO WORLD") == ["▁HELLO", "▁WORLD"]
    assert enc.decode_pieces(["▁HELLO", "▁WORLD"]) == "HELLO WORLD"


def test_unigram_unknown_chars_map_to_unk(tmp_path):
    path = _write_model(tmp_path / "uni.model", UNIGRAM_PIECES, 1)
    enc = PureSentencePieceEncoder(path)
    pieces = enc.encode_as_pieces("HEX")
    assert pieces == ["▁HE", "<unk>"]


def test_bpe_merges_by_score(tmp_path):
    bpe_pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("▁", 0.0, NORMAL),
        ("A", 0.0, NORMAL),
        ("B", 0.0, NORMAL),
        ("AB", -1.0, NORMAL),    # rank 1 merge
        ("▁AB", -2.0, NORMAL),   # rank 2 merge
    ]
    path = _write_model(tmp_path / "bpe.model", bpe_pieces, 2)
    enc = PureSentencePieceEncoder(path)
    assert enc.model_type == 2
    assert enc.encode_as_pieces("AB") == ["▁AB"]
    assert enc.encode_as_pieces("AB AB") == ["▁AB", "▁AB"]
    # 'BA' has no merge: stays as single symbols (incl. the dummy prefix)
    assert enc.encode_as_pieces("BA") == ["▁", "B", "A"]


def test_tokenizer_falls_back_to_pure_reader(tmp_path):
    # make_piece_encoder on a .model path must work without sentencepiece
    # (not installed in this image).
    path = _write_model(tmp_path / "uni.model", UNIGRAM_PIECES, 1)
    enc = make_piece_encoder(path)
    assert isinstance(enc, PureSentencePieceEncoder)
    vocab = {"<blank>": 0, "<unk>": 1, "▁HELLO": 2, "▁WORLD": 3,
             "<sos/eos>": 4}
    tok = Tokenizer(vocab, bpe_model=path)
    tokens, ids = tok.encode("hello world")
    assert tokens == ["▁HELLO", "▁WORLD"]
    assert ids == [2, 3]
    assert tok.decode_ids(ids) == "HELLO WORLD"


def test_byte_fallback_round_trip(tmp_path):
    BYTE = 6
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("▁HI", -1.0, NORMAL),
    ] + [(f"<0x{b:02X}>", -10.0, BYTE) for b in range(256)]
    path = _write_model(tmp_path / "bf.model", pieces, 1)
    enc = PureSentencePieceEncoder(path)
    # 'É' (U+00C9) is OOV -> UTF-8 bytes C3 89 as byte pieces
    got = enc.encode_as_pieces("HI É")
    assert got[0] == "▁HI"
    assert "<0xC3>" in got and "<0x89>" in got
    assert "<unk>" not in got
    # decode reassembles the bytes into the original character
    assert enc.decode_pieces(got) == "HI É"
    # literal text that LOOKS like a byte piece must not match one: the
    # '<'/'0'/'x' chars are OOV and byte-fallback individually, so the
    # result decodes back to the literal string, not to chr(0x41)
    lit = enc.encode_as_pieces("<0x41>")
    assert enc.decode_pieces(lit) == "<0x41>"


def test_greedy_vocab_encoder_from_sp_vocab():
    """A sentencepiece-style vocab WITHOUT the .model file: the tokenizer
    auto-selects greedy longest-match segmentation; every piece is
    in-vocab and decode round-trips (used by the trained-real-speech
    evidence against the reference's shipped vocab.txt)."""
    from conformer_tpu.data.tokenizer import Tokenizer

    vocab = {"<blank>": 0, "<unk>": 1, "▁": 2, "▁THE": 3, "▁WEATHER": 4,
             "THE": 5, "ER": 6, "▁W": 7, "E": 8, "A": 9, "T": 10, "H": 11,
             "R": 12, "<sos/eos>": 13}
    t = Tokenizer(vocab)
    toks, ids = t.encode("THE WEATHER")
    assert toks == ["▁THE", "▁WEATHER"]
    assert ids == [3, 4]
    assert t.decode_ids(ids) == "THE WEATHER"
    # longest-match falls back to shorter pieces for unseen words
    toks2, ids2 = t.encode("THEE")
    assert toks2 == ["▁THE", "E"]
    assert t.decode_ids(ids2) == "THEE"
    # char vocab (no ▁ pieces) keeps the reference char fallback
    t_char = Tokenizer({"<blank>": 0, "<unk>": 1, "A": 2, "B": 3, "_": 4,
                        "<sos/eos>": 5})
    toks3, _ = t_char.encode("AB BA")
    assert toks3 == ["A", "B", "_", "B", "A"]
