"""Device kernel library.

The TPU replacement for the reference's per-arch SIMD/asm kernel tables
(SURVEY.md §2.9): every module here exposes pure jax functions over
batched tensors, compiled/fused by XLA or hand-written in Pallas.

Modules:
    tx         FFT/RDFT/MDCT/DCT/DST transforms  (libavutil/tx analog)
    dct8x8     8x8 block DCT/IDCT, float + fixed-point (fdctdsp/idctdsp)
    firdesign  host-side FIR coefficient construction (resample/scale banks)
    fir        device polyphase FIR application
    colorspace YUV<->RGB matrices and range conversion (yuv2rgb analog)
    motion     SAD/SATD block metrics + motion search (me_cmp/motion_est)
    interp     half/quarter-pel interpolation (hpeldsp/qpeldsp)
"""
