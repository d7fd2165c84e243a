"""BPE encode (apply trained merges): scalar reference + invariance."""
import re

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _reference_encode(texts, merges_codes, char_code):
    """Pure-Python canonical encoder: chars -> codes (-1 UNK), merges
    applied in rank order, each greedy left-to-right non-overlapping
    within word boundaries — the trainer's own convention."""
    out = []
    for txt in texts:
        toks = []
        for w in re.split(r"\s+", txt):
            if not w:
                continue
            syms = [char_code.get(c, -1) for c in w]
            for ca, cb, new in merges_codes:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == ca \
                            and syms[i + 1] == cb:
                        res.append(new)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            toks.extend(syms)
        n_unk = sum(1 for t in toks if t == -1)
        checksum = sum((i + 1) * (t + 2) for i, t in enumerate(toks))
        out.append((len(toks), n_unk, checksum))
    return out


def _codes(merges, symtab):
    code_of = {s: i for i, s in enumerate(symtab)}
    mc = [(code_of[l], code_of[r], code_of[n])
          for l, r, n in zip(merges["left_sym"].to_pylist(),
                             merges["right_sym"].to_pylist(),
                             merges["new_sym"].to_pylist())]
    cc = {s: i for i, s in enumerate(symtab) if len(s) == 1}
    return mc, cc


@pytest.fixture(scope="module")
def trained(ray_session):
    import ray

    from geobuf_ray.functions.text import bpe_train

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    merges, symtab = bpe_train(ds, k=12)
    return merges, symtab


def test_encode_matches_scalar_reference(ray_session, trained):
    import pyarrow.parquet as pq
    import ray

    from geobuf_ray.functions.text import bpe_encode

    merges, symtab = trained
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = pa.concat_tables(ray.get(
        bpe_encode(ds, merges, symtab).to_arrow_refs()))
    ids = got["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    ro = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
    texts = np.asarray(t["text"].to_pylist(), object)[ro]
    mc, cc = _codes(merges, symtab)
    want = _reference_encode(texts, mc, cc)
    assert list(zip(got["n_tokens"].to_numpy()[order].tolist(),
                    got["n_unk"].to_numpy()[order].tolist(),
                    got["checksum"].to_numpy()[order].tolist())) == want
    assert got["n_unk"].to_numpy().sum() == 0  # same-corpus coverage


def test_encode_unknown_chars_and_empty(ray_session, trained):
    import ray

    from geobuf_ray.functions.text import bpe_encode

    merges, symtab = trained
    tbl = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                    "text": pa.array(["über ça", "", "a b"],
                                     pa.string())})
    got = pa.concat_tables(ray.get(bpe_encode(
        ray.data.from_arrow(tbl), merges, symtab).to_arrow_refs()))
    by = {i: (n, u) for i, n, u in zip(got["doc_id"].to_pylist(),
                                       got["n_tokens"].to_pylist(),
                                       got["n_unk"].to_pylist())}
    mc, cc = _codes(merges, symtab)
    want = _reference_encode(["über ça", "", "a b"], mc, cc)
    assert by[7] == (want[0][0], want[0][1]) and by[7][1] >= 2
    assert by[8] == (0, 0)
    assert by[9] == (want[2][0], want[2][1])


def test_encode_partition_invariance(ray_session, trained):
    import ray

    from geobuf_ray.functions.text import bpe_encode

    merges, symtab = trained

    def run(k):
        ds = ray.data.read_parquet(
            f"{SF}/documents.parquet",
            columns=["doc_id", "text"]).repartition(k)
        t = pa.concat_tables(ray.get(
            bpe_encode(ds, merges, symtab).to_arrow_refs()))
        o = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
        return (t["n_tokens"].to_numpy()[o].tolist(),
                t["checksum"].to_numpy()[o].tolist())

    assert run(1) == run(5)
