"""Measure the PyTorch-CPU reference decode throughput (the baseline).

The reference publishes no numbers (BASELINE.md), so the comparison point
is measured: the inline beam-search test_step of the reference
(/root/reference/hypernet_attention.py:242-313) at its shipped dims
(2048 features, 49 regions, feature/embed/hidden 200, V=9684, k=3,
max 50 steps, batch size 1), rebuilt here from raw torch modules with the
same math (no reference code imported).  Run:

    python benchmarks/torch_cpu_baseline.py [num_images]
"""

import json
import sys
import time

import torch
import torch.nn.functional as F

NF, FO, E, H, V, K, MAX_STEPS, R = 2048, 200, 200, 200, 9684, 3, 50, 49


class Captioner(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.ff1 = torch.nn.Linear(NF, FO)
        self.ff2 = torch.nn.Linear(FO, FO)
        self.embed = torch.nn.Embedding(V, E)
        self.gru = torch.nn.GRUCell(E + FO, H)
        self.fc = torch.nn.Linear(H, V)
        self.W_a = torch.nn.Linear(FO, H)
        self.U_a = torch.nn.Linear(H, H)
        self.v_a = torch.nn.Linear(H, 1)
        self.init_h = torch.nn.Linear(FO, H)

    def attention(self, feats, h):
        a = torch.tanh(self.W_a(feats) + self.U_a(h).unsqueeze(1))
        w = torch.softmax(self.v_a(a), dim=1)
        return (w * feats).sum(dim=1)


@torch.no_grad()
def beam_decode(m: Captioner, raw_feature: torch.Tensor) -> list:
    """The reference test_step inline beam for one image."""
    k = K
    feats = m.ff2(torch.relu(m.ff1(raw_feature.unsqueeze(0))))
    feats = feats.expand(k, R, FO)
    h = m.init_h(feats.mean(dim=1))
    k_prev = torch.zeros(k, 1, dtype=torch.long)
    seqs = k_prev
    top_k_scores = torch.zeros(k, 1)
    complete_seqs, complete_scores = [], []
    step = 1
    while True:
        emb = m.embed(k_prev).squeeze(1)
        if k_prev[0][0] == 0:
            emb = torch.zeros_like(emb)
        ctx = m.attention(feats, h)
        h = m.gru(torch.cat([emb, ctx], dim=1), h)
        scores = F.log_softmax(m.fc(h), dim=1)
        scores = top_k_scores.expand_as(scores) + scores
        if step == 1:
            top_sc, top_w = scores[0].topk(k, 0, True, True)
        else:
            top_sc, top_w = scores.view(-1).topk(k, 0, True, True)
        prev_idx = torch.div(top_w, V, rounding_mode="floor")
        next_tok = top_w % V
        seqs = torch.cat([seqs[prev_idx], next_tok.unsqueeze(1)], dim=1)
        incomplete = [i for i, w in enumerate(next_tok) if w != 2]
        complete = list(set(range(len(next_tok))) - set(incomplete))
        if complete:
            complete_seqs.extend(seqs[complete].tolist())
            complete_scores.extend(top_sc[complete].tolist())
        k -= len(complete)
        if k == 0:
            break
        seqs = seqs[incomplete]
        h = h[prev_idx[incomplete]]
        feats = feats[prev_idx[incomplete]]
        top_k_scores = top_sc[incomplete].unsqueeze(1)
        k_prev = next_tok[incomplete].unsqueeze(1)
        if step > MAX_STEPS:
            break
        step += 1
    if not complete_scores:
        return seqs[0].tolist()
    return complete_seqs[complete_scores.index(max(complete_scores))]


def main(n_images: int = 32):
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    m = Captioner().eval()
    # random weights rarely rank </s> in the top-k, so beams run to the
    # 50-step cap — the same fixed horizon the TPU beam always executes,
    # making the two measurements directly comparable
    feats = torch.randn(n_images, R, NF)
    beam_decode(m, feats[0])  # warmup
    t0 = time.perf_counter()
    lat = []
    for i in range(n_images):
        s = time.perf_counter()
        beam_decode(m, feats[i])
        lat.append(time.perf_counter() - s)
    dt = time.perf_counter() - t0
    lat.sort()
    print(json.dumps({
        "metric": "torch_cpu_beam_captions_per_sec",
        "value": n_images / dt,
        "p50_latency_ms": lat[len(lat) // 2] * 1e3,
        "num_images": n_images,
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
