// ============================================================================
// fixsim — native bit-true Q1.7/Q8.8 fixed-point inference engine.
//
// The TPU-native framework's cosimulation oracle: an INDEPENDENT C++
// implementation of the same integer datapath that ofdmgan_tpu/quant/intsim.py
// implements in JAX, both modeling the reference's Verilog RTL semantics
// (rtl/ofdmGAN/generator_mini.v, discriminator_mini.v). Where the reference
// validated its Python model against iverilog testbench runs
// (visualization/rtl_verification_viz.py:62-105), this framework validates
// its JAX integer path against this engine — a true cross-language
// bit-exactness check with no shared code.
//
// Datapath semantics (see intsim.py docstring for RTL line citations):
//   * Q8.8 int16 activations, Q1.7 int8 weights, int32 accumulators
//   * per-tap arithmetic >>7 requantize BEFORE accumulation
//   * bias add (Q8.8) then int16 saturation
//   * LeakyReLU on saturated value: x<0 -> (x>>2)+(x>>4)   (slope 0.3125)
//   * additive skip with saturation; nearest-neighbor x2 upsample
//   * output conv center-tap-only (k=1); tanh = clamp(+-256 -> +-255)
//   * critic: global sum pool to int32, dense reads LOW 16 BITS of pool
//
// ROM layout identical to quant/rom_codegen.py (= rtl weight_rom.v:27-39).
//
// Build: make -C native   (g++ -O2 -shared -fPIC)
// ABI: plain C, consumed via ctypes from ofdmgan_tpu/verify/cosim.py.
// ============================================================================

#include <cstdint>
#include <cstring>

namespace {

constexpr int FRAME = 16;

inline int32_t sat16(int32_t v) {
    if (v > 32767) return 32767;
    if (v < -32768) return -32768;
    return v;
}

inline int32_t lrelu(int32_t v) {
    // v is already int16-saturated; arithmetic shifts (gcc: >> on signed
    // is arithmetic, matching Verilog >>>)
    return (v < 0) ? ((v >> 2) + (v >> 4)) : v;
}

// Generic k=3, pad=1 integer conv layer with per-tap requantize.
// in:  [cin][lin]  out: [cout][lout],  weights at w[oc*(cin*3)+ic*3+k].
void conv_k3(const int16_t* in, int cin, int lin,
             int16_t* out, int cout, int stride,
             const int8_t* w, const int16_t* b, bool act) {
    const int lout = (lin + 2 - 3) / stride + 1;
    for (int oc = 0; oc < cout; ++oc) {
        for (int op = 0; op < lout; ++op) {
            int32_t acc = 0;
            for (int ic = 0; ic < cin; ++ic) {
                for (int k = 0; k < 3; ++k) {
                    const int ti = stride * op - 1 + k;
                    const int32_t x =
                        (ti >= 0 && ti < lin) ? in[ic * lin + ti] : 0;
                    const int32_t prod = x * (int32_t)w[oc * (cin * 3) + ic * 3 + k];
                    acc += (prod >> 7);
                }
            }
            acc += b[oc];
            int32_t r = sat16(acc);
            if (act) r = lrelu(r);
            out[oc * lout + op] = (int16_t)r;
        }
    }
}

void upsample2(const int16_t* in, int ch, int lin, int16_t* out) {
    for (int c = 0; c < ch; ++c)
        for (int t = 0; t < lin; ++t) {
            out[c * (2 * lin) + 2 * t] = in[c * lin + t];
            out[c * (2 * lin) + 2 * t + 1] = in[c * lin + t];
        }
}

}  // namespace

extern "C" {

// Generator forward: input/output are channel-major [2][16] Q8.8.
// weights: 2048-entry Q1.7 ROM image; biases: 64-entry Q8.8 ROM image.
// residual != 0: replace the clamp-tanh output stage with a SATURATING
// INPUT ADD (out = sat16(conv + bias + input)) — the hardware form of the
// input-residual head (one skip wire + adder; intsim mode "rtl_residual").
static void generator_forward_impl(const int8_t* rom_w, const int16_t* rom_b,
                                   const int16_t* input, int16_t* output,
                                   int residual) {
    int16_t enc1[4 * 8], bneck[8 * 4], up1[8 * 8], dec1[4 * 8];
    int16_t skip[4 * 8], up2[4 * 16];

    conv_k3(input, 2, FRAME, enc1, 4, 2, rom_w + 0, rom_b + 0, true);
    conv_k3(enc1, 4, 8, bneck, 8, 2, rom_w + 24, rom_b + 4, true);
    upsample2(bneck, 8, 4, up1);
    conv_k3(up1, 8, 8, dec1, 4, 1, rom_w + 120, rom_b + 12, true);
    for (int i = 0; i < 4 * 8; ++i) skip[i] = (int16_t)sat16((int32_t)dec1[i] + enc1[i]);
    upsample2(skip, 4, 8, up2);

    // output conv: k=1 center tap, weights at [216 + oc*4 + ic]
    for (int oc = 0; oc < 2; ++oc) {
        for (int t = 0; t < FRAME; ++t) {
            int32_t acc = 0;
            for (int ic = 0; ic < 4; ++ic) {
                const int32_t prod =
                    (int32_t)up2[ic * FRAME + t] * (int32_t)rom_w[216 + oc * 4 + ic];
                acc += (prod >> 7);
            }
            acc += rom_b[16 + oc];
            int32_t r;
            if (residual) {
                r = sat16(acc + (int32_t)input[oc * FRAME + t]);
            } else {
                r = sat16(acc);
                // tanh-as-clamp: >256 -> 255, < -256 -> -255 (exactly +-256 pass)
                if (r > 256) r = 255;
                else if (r < -256) r = -255;
            }
            output[oc * FRAME + t] = (int16_t)r;
        }
    }
}

void fixsim_generator_forward(const int8_t* rom_w, const int16_t* rom_b,
                              const int16_t* input, int16_t* output) {
    generator_forward_impl(rom_w, rom_b, input, output, 0);
}

void fixsim_generator_forward_res(const int8_t* rom_w, const int16_t* rom_b,
                                  const int16_t* input, int16_t* output) {
    generator_forward_impl(rom_w, rom_b, input, output, 1);
}

// Critic forward: candidate/condition channel-major [2][16] Q8.8 -> score.
int16_t fixsim_discriminator_forward(const int8_t* rom_w, const int16_t* rom_b,
                                     const int16_t* cand, const int16_t* cond) {
    int16_t x[4 * FRAME];
    std::memcpy(x, cand, sizeof(int16_t) * 2 * FRAME);
    std::memcpy(x + 2 * FRAME, cond, sizeof(int16_t) * 2 * FRAME);

    int16_t c1[8 * 8], c2[16 * 4];
    conv_k3(x, 4, FRAME, c1, 8, 2, rom_w + 256, rom_b + 32, true);
    conv_k3(c1, 8, 8, c2, 16, 2, rom_w + 352, rom_b + 40, true);

    int32_t dense_acc = 0;
    for (int c = 0; c < 16; ++c) {
        int32_t pool = 0;
        for (int t = 0; t < 4; ++t) pool += c2[c * 4 + t];
        // hardware reads only the low 16 bits of the pooled accumulator
        const int16_t pool16 = (int16_t)(pool & 0xFFFF);
        dense_acc += (((int32_t)pool16 * (int32_t)rom_w[736 + c]) >> 7);
    }
    dense_acc += rom_b[56];
    return (int16_t)sat16(dense_acc);
}

// Batched wrappers (loop over frames; layouts [n][2][16]).
void fixsim_generator_forward_batch(const int8_t* rom_w, const int16_t* rom_b,
                                    const int16_t* input, int16_t* output, int n) {
    for (int i = 0; i < n; ++i)
        fixsim_generator_forward(rom_w, rom_b, input + i * 2 * FRAME,
                                 output + i * 2 * FRAME);
}

void fixsim_generator_forward_res_batch(const int8_t* rom_w, const int16_t* rom_b,
                                        const int16_t* input, int16_t* output, int n) {
    for (int i = 0; i < n; ++i)
        fixsim_generator_forward_res(rom_w, rom_b, input + i * 2 * FRAME,
                                     output + i * 2 * FRAME);
}

void fixsim_discriminator_forward_batch(const int8_t* rom_w, const int16_t* rom_b,
                                        const int16_t* cand, const int16_t* cond,
                                        int16_t* scores, int n) {
    for (int i = 0; i < n; ++i)
        scores[i] = fixsim_discriminator_forward(rom_w, rom_b,
                                                 cand + i * 2 * FRAME,
                                                 cond + i * 2 * FRAME);
}

}  // extern "C"
