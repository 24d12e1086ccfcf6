"""One-time capture of REAL TF-Hub BEM model outputs as an offline fixture.

Run this ON A NETWORKED MACHINE (needs tensorflow, tensorflow_hub,
tensorflow_text — the reference's BEM dependencies,
/root/reference/src/tools/evaluation_utils.py:281-330):

    python scripts/capture_bem_fixture.py --out tests/fixtures/bem_fixture.json

It scores the ~20 triples below with the genuine
https://tfhub.dev/google/answer_equivalence/bem/1 model using the
reference's own preprocessing (tensorflow_text BertTokenizer +
combine_segments), and writes a JSON fixture carrying, per triple:

  - question / reference / candidate
  - the exact int input_ids + segment_ids the TF pipeline produced
  - the raw (2,) logits the TF-Hub model returned

plus the BEM vocab (the tokenizer's vocab list, so the offline test can
rebuild the identical WordPieceTokenizer).

tests/test_bem.py::test_real_bem_fixture then (a) pins
ravqa_tpu.metrics.bem.bertify_example byte-for-byte against the captured
TF preprocessing and (b) drives make_bem_scorer against the captured
genuine logits — no mock anywhere in the assertion path. Gate:
RAVQA_BEM_FIXTURE=/path/to/bem_fixture.json (or the default vendored
location tests/fixtures/bem_fixture.json if present).
"""

import argparse
import json

# ~20 triples spanning the behaviors the scorer must honor: equivalent
# paraphrases, contradictions, numeric formats, list ('&&') references,
# case/punctuation robustness, substrings that are NOT equivalent.
TRIPLES = [
    ("what is the capital of france", "paris", "paris"),
    ("what is the capital of france", "paris", "the city of paris"),
    ("what is the capital of france", "paris", "london"),
    ("what animal is shown", "a cat", "a small cat"),
    ("what animal is shown", "a cat", "a dog"),
    ("how many players on a soccer team", "11", "eleven"),
    ("how many players on a soccer team", "11", "twelve"),
    ("what color is the sky", "blue", "light blue"),
    ("what color is the sky", "blue", "red"),
    ("who wrote hamlet", "william shakespeare", "shakespeare"),
    ("who wrote hamlet", "william shakespeare", "francis bacon"),
    ("what is the boiling point of water", "100 degrees celsius",
     "100 c"),
    ("what is the boiling point of water", "100 degrees celsius",
     "50 degrees"),
    ("what fruit is yellow and curved", "banana", "a ripe banana"),
    ("what fruit is yellow and curved", "banana", "an apple"),
    ("what sport uses a racket && tennis", "tennis && badminton",
     "tennis"),
    ("where is the eiffel tower", "paris france", "Paris, France."),
    ("what is two plus two", "4", "four"),
    ("what is two plus two", "4", "5"),
    ("what gas do plants absorb", "carbon dioxide", "co2"),
    ("what gas do plants absorb", "carbon dioxide", "oxygen"),
]

BEM_URL = "https://tfhub.dev/google/answer_equivalence/bem/1"
VOCAB_URL = ("https://storage.googleapis.com/cloud-tpu-checkpoints/"
             "bert/keras_bert/uncased_L-12_H-768_A-12/vocab.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/bem_fixture.json")
    ap.add_argument("--vocab", default=None,
                    help="local vocab.txt (default: download VOCAB_URL)")
    args = ap.parse_args()

    import numpy as np
    import tensorflow as tf
    import tensorflow_hub as hub
    import tensorflow_text as text  # noqa: F401

    if args.vocab:
        vocab_path = args.vocab
    else:
        import urllib.request
        vocab_path = "/tmp/bem_vocab.txt"
        urllib.request.urlretrieve(VOCAB_URL, vocab_path)
    vocab = [l.rstrip("\n") for l in open(vocab_path)]

    # the reference's preprocessing, verbatim semantics
    # (evaluation_utils.py:286-330)
    vocab_table = tf.lookup.StaticVocabularyTable(
        tf.lookup.KeyValueTensorInitializer(
            keys=vocab, key_dtype=tf.string,
            values=tf.range(len(vocab), dtype=tf.int64),
            value_dtype=tf.int64),
        num_oov_buckets=1)
    cls_id, sep_id = vocab_table.lookup(
        tf.convert_to_tensor(["[CLS]", "[SEP]"]))
    tokenizer = text.BertTokenizer(vocab_lookup_table=vocab_table,
                                   token_out_type=tf.int64,
                                   preserve_unused_token=True,
                                   lower_case=True)

    def bertify(question, reference, candidate):
        q = tokenizer.tokenize(question).merge_dims(1, 2)
        r = tokenizer.tokenize(reference).merge_dims(1, 2)
        c = tokenizer.tokenize(candidate).merge_dims(1, 2)
        ids, segs = text.combine_segments(
            (c, r, q), cls_id, sep_id)
        ids = tf.cast(ids.to_tensor(shape=(1, 512)), tf.int32)
        segs = tf.cast(segs.to_tensor(shape=(1, 512)), tf.int32)
        return ids, segs

    bem = hub.load(BEM_URL)
    records = []
    for question, reference, candidate in TRIPLES:
        ref_joined = reference.replace("&&", ",")
        ids, segs = bertify(question, ref_joined, candidate)
        logits = np.squeeze(np.asarray(
            bem({"input_ids": ids, "segment_ids": segs})))
        ids_np, segs_np = np.asarray(ids)[0], np.asarray(segs)[0]
        used = int(np.max(np.nonzero(ids_np)) + 1)
        records.append({
            "question": question, "reference": reference,
            "candidate": candidate,
            "input_ids": ids_np[:used].tolist(),
            "segment_ids": segs_np[:used].tolist(),
            "logits": [float(x) for x in logits],
        })
        print(f"{candidate!r} vs {reference!r}: logits={logits}")

    with open(args.out, "w") as f:
        json.dump({"model_url": BEM_URL, "max_len": 512,
                   "vocab": vocab, "records": records}, f)
    print(f"wrote {args.out} ({len(records)} records)")


if __name__ == "__main__":
    main()
