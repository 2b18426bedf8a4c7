"""Torch oracle for golden-parity tests.

An independent torch implementation of the architecture pinned by the reference
demo checkpoint (SURVEY.md §2.2): module names match the checkpoint's state_dict
keys exactly so the demo weights load verbatim, and the forward path uses torch's
own ``nn.TransformerEncoder`` — giving a trustworthy numerical oracle for the JAX
model without copying any reference code (the reference's model lives in an absent
submodule anyway).
"""

import math

import torch
from torch import nn


class PositionalEncoding(nn.Module):
    def __init__(self, d_model, max_len, dropout):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1).float()
        div_term = torch.exp(
            torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model)
        )
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term[: d_model // 2])
        self.register_buffer("pe", pe)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        return self.dropout(x + self.pe[:, : x.size(1)])


class InputLayerEncoder(nn.Module):
    def __init__(self, embedding_size, d_model, dropout, max_len):
        super().__init__()
        self.Linear = nn.Linear(embedding_size, d_model)
        self.ReLU = nn.ReLU()
        self.PositionalEncoding = PositionalEncoding(d_model, max_len, dropout)

    def forward(self, src):
        return self.PositionalEncoding(self.ReLU(self.Linear(src)))


class EncoderWrapper(nn.Module):
    def __init__(self, d_model, n_heads, dim_ff, dropout, n_layers):
        super().__init__()
        layer = nn.TransformerEncoderLayer(
            d_model,
            n_heads,
            dim_feedforward=dim_ff,
            dropout=dropout,
            activation="relu",
            batch_first=True,
            norm_first=False,  # post-LN, as in torch 1.10 defaults
        )
        self.Encoder = nn.TransformerEncoder(
            layer, n_layers, norm=nn.LayerNorm(d_model)
        )

    def forward(self, x):
        return self.Encoder(x)


class OutputLayer(nn.Module):
    def __init__(self, embedding_size_tgt, d_model):
        super().__init__()
        self.embedding_size = embedding_size_tgt
        self.Linear = nn.Linear(d_model, embedding_size_tgt)

    def forward(self, x):
        y = self.Linear(x)
        h, v, o = torch.split(y, self.embedding_size // 3, dim=2)
        return h, torch.sigmoid(v), torch.tanh(o) * 0.5


class TorchGrooveTransformerEncoder(nn.Module):
    """Names match the reference checkpoint: InputLayerEncoder / Encoder.Encoder /
    OutputLayer."""

    def __init__(self, embedding_size_src, embedding_size_tgt, d_model, n_heads,
                 dim_ff, dropout, n_layers, max_len):
        super().__init__()
        self.InputLayerEncoder = InputLayerEncoder(
            embedding_size_src, d_model, dropout, max_len
        )
        self.Encoder = EncoderWrapper(d_model, n_heads, dim_ff, dropout, n_layers)
        self.OutputLayer = OutputLayer(embedding_size_tgt, d_model)

    def forward(self, src):
        return self.OutputLayer(self.Encoder(self.InputLayerEncoder(src)))

    @torch.no_grad()
    def predict(self, src, use_thres=True, thres=0.5):
        self.eval()
        h, v, o = self.forward(src)
        h = torch.sigmoid(h)
        if use_thres:
            h = (h > thres).float()
        return [h, v, o]


class DecoderWrapper(nn.Module):
    def __init__(self, d_model, n_heads, dim_ff, dropout, n_layers):
        super().__init__()
        layer = nn.TransformerDecoderLayer(
            d_model,
            n_heads,
            dim_feedforward=dim_ff,
            dropout=dropout,
            activation="relu",
            batch_first=True,
            norm_first=False,  # post-LN, torch 1.10 defaults
        )
        self.Decoder = nn.TransformerDecoder(
            layer, n_layers, norm=nn.LayerNorm(d_model)
        )

    def forward(self, x, memory):
        # causal tgt mask (torch's canonical teacher-forcing usage): without
        # it, position t attends the shifted-right row holding its own label
        t = x.shape[1]
        mask = torch.nn.Transformer.generate_square_subsequent_mask(t)
        return self.Decoder(x, memory, tgt_mask=mask)


class TorchGrooveTransformer(nn.Module):
    """Encoder-decoder oracle for the reference's ``encoder_only=0`` family
    (/root/reference/train.py:125-127). No reference decoder checkpoint
    exists, so this pins the *adopted* semantics (post-LN torch decoder
    layers, packed-kv cross-attention, zero-row shift-right teacher forcing)
    against torch's own ``nn.TransformerDecoder``."""

    def __init__(self, embedding_size_src, embedding_size_tgt, d_model,
                 n_heads, dim_ff, dropout, n_layers_enc, n_layers_dec,
                 max_len):
        super().__init__()
        self.InputLayerEncoder = InputLayerEncoder(
            embedding_size_src, d_model, dropout, max_len
        )
        self.Encoder = EncoderWrapper(
            d_model, n_heads, dim_ff, dropout, n_layers_enc
        )
        self.InputLayerDecoder = InputLayerEncoder(
            embedding_size_tgt, d_model, dropout, max_len
        )
        self.Decoder = DecoderWrapper(
            d_model, n_heads, dim_ff, dropout, n_layers_dec
        )
        self.OutputLayer = OutputLayer(embedding_size_tgt, d_model)

    def forward(self, src, tgt=None):
        memory = self.Encoder(self.InputLayerEncoder(src))
        if tgt is None:
            tgt = torch.zeros(
                src.shape[0], src.shape[1], self.OutputLayer.embedding_size,
                dtype=src.dtype)
        tgt_in = torch.cat(
            [torch.zeros_like(tgt[:, :1, :]), tgt[:, :-1, :]], dim=1
        )  # zero-row shift-right teacher forcing
        y = self.Decoder(self.InputLayerDecoder(tgt_in), memory)
        return self.OutputLayer(y)


def torch_calculate_loss(prediction, y, hit_loss_penalty):
    """Loss oracle: BCE-with-logits + 2×MSE, penalty-masked, sum-over-voices then
    mean (the reconstruction documented in models/losses.py)."""
    bce_fn = nn.BCEWithLogitsLoss(reduction="none")
    mse_fn = nn.MSELoss(reduction="none")
    div = y.shape[2] // 3
    y_h, y_v, y_o = torch.split(y, div, dim=2)
    pred_h, pred_v, pred_o = prediction
    penalty = torch.where(y_h == 1, 1.0, float(hit_loss_penalty))
    bce_hits = (bce_fn(pred_h, y_h) * penalty).sum(dim=2).mean()
    mse_vel = (mse_fn(pred_v, y_v) * penalty).sum(dim=2).mean()
    mse_off = (mse_fn(pred_o, y_o) * penalty).sum(dim=2).mean()
    return bce_hits + mse_vel + mse_off, bce_hits, mse_vel, mse_off
