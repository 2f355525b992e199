"""Torch oracle of the reference AWARE pipeline — tests only.

An independent reimplementation (from the behavioral spec in SURVEY.md §2-§3)
of the reference detector net and embed loop in PyTorch, used as the parity
oracle for the JAX build.  This file intentionally uses torch; it never ships
in the runtime path.

Spec sources (reference repo, not imported):
  - net: src/AWARE/detection/multibit_detector_net.py:14-140
  - modules: detection/modules/{conv1d.py,BRH.py,globalStandardize.py,mel.py}
  - embed loop: src/AWARE/embedding/multibit_embedder.py:43-197
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from aware_tpu.ops.mel import mel_filter_bank

SEED = 328656719


class OracleGlobalStandardize(nn.Module):
    def forward(self, x):
        return (x - x.mean()) / (x.std() + 1e-8)


class OracleBRH(nn.Module):
    def __init__(self, final_activation):
        super().__init__()
        self.final_activation = final_activation
        self.global_avg_pool = nn.AdaptiveAvgPool1d(1)

    def forward(self, x):
        x = self.global_avg_pool(x)
        return self.final_activation(x[:, 0::2] - x[:, 1::2])


class OracleConvBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Conv1d(in_ch, out_ch, kernel_size=1, stride=1, padding=0)
        self.norm_layer = nn.InstanceNorm1d(out_ch)
        self.activation = nn.LeakyReLU(0.2)

    def forward(self, x):
        return self.activation(self.norm_layer(self.conv(x)))


class OracleDetectorNet(nn.Module):
    """Mirror of AWAREDetectorNet with the default card, incl. the
    discarded-global-norm quirk and the seeded init order."""

    def __init__(self, sample_rate=16000, n_fft=1024, n_mels=128,
                 n_filters=(512, 1024, 1024), output_length=20):
        super().__init__()
        self.output_length = output_length
        self.global_norm1 = OracleGlobalStandardize()
        basis = mel_filter_bank(sample_rate, n_fft, n_mels)
        self.register_buffer("mel_filter_bank", torch.from_numpy(basis.copy()))
        self.instance_norm = nn.InstanceNorm1d(n_mels)
        self.global_norm2 = OracleGlobalStandardize()
        self.initial_pool = nn.AvgPool1d(kernel_size=2, stride=2)
        channels = [n_mels, *n_filters, 2 * output_length]
        self.conv_blocks = nn.ModuleList(
            OracleConvBlock(channels[i], channels[i + 1])
            for i in range(len(channels) - 1)
        )
        self.final_activation = nn.Tanh()
        self.BRH = OracleBRH(self.final_activation)
        torch.manual_seed(SEED)
        self.apply(self._init_weights)

    @staticmethod
    def _init_weights(m):
        if isinstance(m, (nn.Conv1d, nn.Linear)):
            nn.init.xavier_uniform_(m.weight)
            if m.bias is not None:
                nn.init.constant_(m.bias, 0)
        elif isinstance(m, nn.InstanceNorm1d):
            if m.weight is not None:
                nn.init.constant_(m.weight, 1)
            if m.bias is not None:
                nn.init.constant_(m.bias, 0)

    def forward(self, stft_magnitude):
        x = self.global_norm1(stft_magnitude)  # discarded (reference :121-124)
        x = torch.einsum("bft,mf->bmt", stft_magnitude, self.mel_filter_bank)
        x = self.instance_norm(x)
        x = self.global_norm2(x)
        x = self.initial_pool(x)
        for block in self.conv_blocks:
            x = block(x)
        return self.BRH(x)


def oracle_stft_mag_phase(audio: np.ndarray, n_fft=1024, hop=256):
    x = torch.from_numpy(audio).float()
    x = x / (torch.max(torch.abs(x)) + 1e-8)
    z = torch.stft(x, n_fft=n_fft, hop_length=hop, center=True,
                   window=torch.hann_window(n_fft), return_complex=True)
    return z.abs(), z.angle()


def oracle_detect_values(net: OracleDetectorNet, audio: np.ndarray,
                         sample_rate=16000, n_fft=1024, hop=256,
                         bands=(500.0, 4000.0)) -> np.ndarray:
    """Waveform -> 20 detector values (reference: multibit_detector.py:28-42)."""
    mag, _ = oracle_stft_mag_phase(audio, n_fft, hop)
    freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    out_band = np.where(~((freqs >= bands[0]) & (freqs <= bands[1])))[0]
    mag[out_band] = 0.0
    with torch.no_grad():
        return net(mag.unsqueeze(0)).squeeze().numpy()


def oracle_embed(net: OracleDetectorNet, audio: np.ndarray,
                 watermark_pm1: np.ndarray, num_iterations=400, lr=0.1,
                 tolerance_db=6.0, sample_rate=16000, n_fft=1024, hop=256,
                 bands=(500.0, 4000.0)) -> np.ndarray:
    """Full reference embed loop (multibit_embedder.py:70-197), incl. the
    best-tracking quirk (loss_t paired with post-step coeffs_{t+1})."""
    win = torch.hann_window(n_fft)

    def pre(x):
        x = x / (torch.max(torch.abs(x)) + 1e-8)
        z = torch.stft(x, n_fft=n_fft, hop_length=hop, center=True,
                       window=win, return_complex=True)
        return z.abs(), z.angle()

    def post(mag, phase):
        z = mag * torch.exp(1j * phase)
        y = torch.istft(z, n_fft=n_fft, hop_length=hop, center=True, window=win)
        return y / (torch.max(torch.abs(y)) + 1e-8)

    for p in net.parameters():
        p.requires_grad = False

    x = torch.from_numpy(audio).float()
    magnitude, phase = pre(x)
    freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mask = (freqs >= bands[0]) & (freqs <= bands[1])
    fi = np.where(mask)[0]
    nfi = np.where(~mask)[0]

    coeffs0 = magnitude[fi].flatten()
    delta = coeffs0 * 10 ** (-tolerance_db / 20)
    lower = torch.clamp(coeffs0 - delta, min=0)
    upper = coeffs0 + delta

    coeffs = coeffs0.clone().requires_grad_(True)
    wm = torch.from_numpy(watermark_pm1).float()
    opt = torch.optim.NAdam([coeffs], lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=0.9, patience=500)

    best_loss = float("inf")
    best_coeffs = coeffs.clone()
    for _ in range(num_iterations):
        opt.zero_grad()
        wmag = magnitude.clone()
        wmag[fi] = coeffs.reshape(len(fi), -1)
        m2, _ = pre(post(wmag, phase))
        wmag2 = m2.clone()
        wmag2[nfi] = 0.0
        pred = net(wmag2.unsqueeze(0)).squeeze()
        loss = torch.nn.functional.mse_loss(pred, wm) - 0.1 * torch.mean(torch.abs(pred))
        loss.backward()
        opt.step()
        sched.step(loss)
        with torch.no_grad():
            coeffs.data = torch.clamp(coeffs.data, lower, upper)
        if loss.item() < best_loss:
            best_loss = loss.item()
            best_coeffs = coeffs.clone().detach()

    wmag = magnitude.clone().detach()
    wmag[fi] = best_coeffs.reshape(len(fi), -1)
    return post(wmag, phase).detach().numpy()
