#!/usr/bin/env python
"""BERT sentence-embedding demo — counterpart of
/root/reference/examples/demo_bert.cpp (gte-small mean-pooled, L2-normalized
embeddings + cosine similarity):

  python examples/demo_bert.py -m <bert_dir> \\
      --texts "Help me set an alarm at 21:30" "What time is it?"
"""

import time

from _demo_common import jnp, np, std_parser


def main():
    ap = std_parser(__doc__)
    ap.add_argument("--texts", nargs="+",
                    default=["Help me set an alarm at 21:30",
                             "Set an alarm at half past nine tonight",
                             "What is the weather today?"])
    args = ap.parse_args()

    from mllm_tpu.models.bert import bert_config_from_hf, load_bert
    from mllm_tpu.models.registry import open_loader
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer

    t0 = time.perf_counter()
    cfg = bert_config_from_hf(args.model)
    model = load_bert(open_loader(args.model), cfg, jnp.float32)
    tok = auto_tokenizer(args.model)
    print(f"load: {time.perf_counter() - t0:.1f} s")

    cls = tok.token_to_id.get("[CLS]", 101)
    sep = tok.token_to_id.get("[SEP]", 102)
    seqs = [[cls] + tok.encode(t) + [sep] for t in args.texts]
    width = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), width), np.int32)
    mask = np.zeros((len(seqs), width), np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1

    emb = np.asarray(model.sentence_embedding(jnp.asarray(ids), jnp.asarray(mask)))
    sim = emb @ emb.T
    print("cosine similarity:")
    for i, t in enumerate(args.texts):
        print(f"  [{i}] {t!r}")
    for i in range(len(args.texts)):
        print("  " + "  ".join(f"{sim[i, j]:6.3f}" for j in range(len(args.texts))))


if __name__ == "__main__":
    main()
