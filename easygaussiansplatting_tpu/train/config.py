"""Training configuration.

Centralises every hyper-parameter the reference hard-codes (SURVEY.md §5:
LRs gsmodel.py:117-127, thresholds gsmodel.py:175-179, loss lambda
pytorch_ssim.py:64, schedule train.py:40-77). The defaults ARE the reference
recipe — the parity preset.
"""

import dataclasses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # epochs / cadence (reference train.py:40-77)
    epochs: int = 100
    densify_every_epochs: int = 5
    densify_until_epoch: int = 50
    reset_alpha_every_epochs: int = 15
    save_every_epochs: int = 10

    # learning rates (reference gsmodel.py:117-127, 181-184)
    lr_low_shs: float = 1e-3
    lr_high_shs: float = 1e-3 / 20.0
    lr_alphas: float = 0.05
    lr_scales: float = 5e-3
    lr_rots: float = 1e-3
    lr_pws_init_scale: float = 1e-4   # * scene_size
    lr_pws_final_scale: float = 1e-6  # * scene_size
    lr_delay_mult: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-15  # reference train.py:32

    # densification thresholds (reference gsmodel.py:175-179)
    grad_threshold: float = 4e-7
    scale_threshold_scale: float = 0.01   # * scene_size
    alpha_threshold: float = 0.005
    big_threshold_scale: float = 0.1      # * scene_size
    reset_alpha_val: float = 0.01
    split_scale_factor: float = 0.6       # gsmodel.py:282

    # loss (reference pytorch_ssim.py:64)
    loss_lambda: float = 0.2

    # rasteriser ("auto" = Pallas kernels on TPU, tiled AD elsewhere —
    # a default-config train() must never silently use the fallback backend
    # on real hardware; ops/rasterize.resolve_backend)
    backend: str = "auto"
    tile: int = 16
    max_patches: int = 2**18
    max_rows: int = None  # None = max_patches (safe); rows ~= patches / mean width
    # k_chunk: Pallas chunk-block rows (sub-chunked internally in units of
    # 128; bigger blocks amortise grid-step overhead). The tiled backend
    # reads k_chunk as its scan chunk length with n_chunks*k_chunk the
    # per-tile list capacity — a Pallas-sized 512 would silently 8x its
    # per-tile compute, so None resolves to a per-backend default
    # (raster_chunks()) while an explicit value is always honored.
    k_chunk: int = None  # None = backend default (pallas 512, tiled 64)
    n_chunks: int = 16
    sh_degree: int = 3

    # adaptive patch budget: binning/packing cost scales with the static
    # max_patches, so the trainer re-sizes it to ~budget_headroom x the
    # observed per-step patch count at epoch boundaries (one recompile per
    # size bucket; the reference instead reads the exact count back to the
    # host every step, gausplat.cu:67)
    adaptive_budget: bool = True
    # Tight headroom won the r4 on-chip budget A/B at the bench scene
    # (573440 = 14.97, 589824 = 14.85, 655360/688128 = 13.6 Mpix/s at the
    # winning kernel flags): every latency-bound binning / sort-reduce
    # stage scales with the static budget, and the steep step below ~36
    # quanta makes rung alignment worth ~5% end-to-end. The ladder
    # (train/loop.py _round_budget) is ~1.125x-stepped above 8 quanta
    # precisely so 1.05x of the 549k bench scene lands on the measured
    # 589824 rung instead of the old {2^k,3*2^k} ladder's 786432; the
    # mid-epoch overflow reaction + background prefetch make tight rungs
    # safe and cheap to grow out of.
    budget_headroom: float = 1.05
    budget_quantum: int = 16384  # ladder rung granularity (scan-kernel block)

    # pool
    capacity_headroom: float = 4.0  # initial capacity = headroom * n_init

    def raster_chunks(self):
        """(k_chunk, n_chunks) for the resolved backend.

        k_chunk means different things per backend: Pallas block rows vs the
        tiled backend's scan chunk length (where n_chunks*k_chunk is the
        per-tile list capacity) — so k_chunk=None resolves to a per-backend
        default; an explicitly-set k_chunk applies to whichever backend
        resolves.
        """
        from easygaussiansplatting_tpu.ops.rasterize import resolve_backend

        k = self.k_chunk
        if k is None:
            k = 512 if resolve_backend(self.backend) == "pallas" else 64
        return k, self.n_chunks
