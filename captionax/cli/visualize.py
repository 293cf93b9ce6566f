"""HTML caption visualizer.

Equivalent of the dominate-based visualizers
(/root/reference/visualize_flickr.py:13-115, visualize_gru.py,
build_html in train_attention_gru.py:63-90): decode test images per style
and emit an HTML table of image / predicted caption / ground truth.
dominate isn't installed, so the HTML is assembled directly.

    python -m captionax.cli.visualize --synthetic --out report.html
"""

from __future__ import annotations

import base64
import html
import io
import os

import jax
import numpy as np

from captionax.cli.common import (
    build_encoder,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_flickr_data,
    resolve_vocab,
)
from captionax.data.transforms import preprocess_images
from captionax.decode import greedy
from captionax.eval.metrics import ids_to_text
from captionax.models.encoder import encoder_cnn
from captionax.models.hypernet import hypernet_apply
from captionax.models.layers import embedding
from captionax.train.checkpoint import restore_checkpoint

STYLES = ("factual", "humour", "romantic")


def img_to_data_uri(img: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def render_rows(rows) -> str:
    cells = []
    for row in rows:
        tds = "".join(
            f"<td style='padding:6px;border:1px solid #ccc'>{c}</td>" for c in row
        )
        cells.append(f"<tr>{tds}</tr>")
    return (
        "<html><body><table style='border-collapse:collapse'>"
        + "".join(cells)
        + "</table></body></html>"
    )


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--out", type=str, default="report.html")
    parser.add_argument("--num-images", type=int, default=8)
    parser.add_argument("--dataset", type=str, default="flickr",
                        choices=["flickr", "cc"],
                        help="cc = visualize_gru_cc/visualize_hyper_cc: "
                             "caption CC images per domain")
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument("--kind", type=str, default="hypernet",
                        choices=["gru", "hypernet"],
                        help="gru = a plain captioner checkpoint "
                             "(visualize_gru): one prediction per image, "
                             "no style columns")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    if args.dataset == "cc":
        from captionax.cli.cc_train_hypernet import build_cc_model_and_embedder
        from captionax.data.cc import ConceptualCaptionsData, load_cc_captions
        from captionax.data.synthetic import synthetic_image

        params, embedder, _ = build_cc_model_and_embedder(
            model_cfg, data_cfg, vocab, k1
        )
        cc = ConceptualCaptionsData(
            load_cc_captions(data_cfg.cc_captions), vocab,
            image_loader=synthetic_image, max_len=train_cfg.max_len,
        )
    elif args.kind == "gru":
        from captionax.cli.common import build_captioner

        # train_gru checkpoints the bare captioner pytree
        params = build_captioner(model_cfg, vocab, k1)
        data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    else:
        params = build_hypernet_model(model_cfg, vocab, k1)
        data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    try:
        params = restore_checkpoint(train_cfg.checkpoint_dir, like=params)
        print(f"loaded checkpoint from {train_cfg.checkpoint_dir}")
    except FileNotFoundError:
        print("no checkpoint; visualizing the random-init model")
    if args.dataset != "cc" and args.kind == "gru":
        params = {"decoder": params}
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)

    encode = jax.jit(lambda imgs: encoder_cnn(encoder_params, preprocess_images(imgs)))
    decode = jax.jit(
        lambda feats, theta: greedy(
            params["decoder"], feats, max_len=train_cfg.max_len, gru_params=theta
        )
    )

    if args.dataset == "cc":
        # one row per (domain, image): predicted vs ground-truth caption
        rows = [["image", "<b>domain</b>", "predicted", "ground truth"]]
        shown = 0
        for dom in cc.domains:
            if shown >= args.num_images:
                break
            idx = cc.by_domain[dom][0]
            img = cc.image(idx)
            feats = encode(img[None])
            theta = hypernet_apply(
                params["hn"],
                embedder.embed(params["domain_emb"],
                               np.asarray(embedder.host_vector(dom))),
            )
            toks = np.asarray(decode(feats, theta))[0]
            rows.append([
                f"<img src='{img_to_data_uri(img)}' width='160'>",
                html.escape(dom),
                html.escape(ids_to_text(toks, vocab)),
                html.escape(cc.rows[idx][1]),
            ])
            shown += 1
        with open(args.out, "w") as f:
            f.write(render_rows(rows))
        print(f"wrote {os.path.abspath(args.out)} ({shown} domains)")
        return args.out

    styles = ("factual",) if args.kind == "gru" else STYLES
    rows = [["image"] + [f"<b>{s}</b>" for s in styles] + ["ground truth"]]
    n = min(args.num_images, len(data))
    imgs = np.stack([data.image(i) for i in range(n)])
    feats = encode(imgs)
    per_style_tokens = {}
    for style in styles:
        if args.kind == "gru":
            theta = None
        else:
            from captionax.train.steps import resolve_style_id, style_table

            style_embed = embedding(
                style_table(params),
                np.int32(resolve_style_id(params, vocab, style)),
            )
            theta = hypernet_apply(params["hn"], style_embed)
        per_style_tokens[style] = np.asarray(decode(feats, theta))
    for i in range(n):
        gt = ids_to_text(data.caption_ids("factual", i, pick=0), vocab)
        row = [f"<img src='{img_to_data_uri(imgs[i])}' width='160'>"]
        for style in styles:
            row.append(html.escape(ids_to_text(per_style_tokens[style][i], vocab)))
        row.append(html.escape(gt))
        rows.append(row)

    with open(args.out, "w") as f:
        f.write(render_rows(rows))
    print(f"wrote {os.path.abspath(args.out)} ({n} images)")
    return args.out


if __name__ == "__main__":
    main()
