// Native runtime support for tcnn_tpu.
//
// PCG32 (M.E. O'Neill, www.pcg-random.org, Apache-2.0) — the same public
// algorithm the reference vendors (dependencies/pcg32/pcg32.h). Used for
// bit-exact, fast parameter initialization of multi-million-entry hash
// grids; the TPU compute path never touches this code.

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t PCG32_MULT = 0x5851f42d4c957f2dULL;

inline uint32_t pcg32_output(uint64_t oldstate) {
    uint32_t xorshifted = (uint32_t)(((oldstate >> 18u) ^ oldstate) >> 27u);
    uint32_t rot = (uint32_t)(oldstate >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((~rot + 1u) & 31));
}

} // namespace

extern "C" {

void pcg32_next_uints(uint64_t* state, const uint64_t* inc, uint64_t n,
                      uint32_t* out) {
    uint64_t s = *state;
    const uint64_t c = *inc;
    for (uint64_t i = 0; i < n; ++i) {
        out[i] = pcg32_output(s);
        s = s * PCG32_MULT + c;
    }
    *state = s;
}

void pcg32_next_floats(uint64_t* state, const uint64_t* inc, uint64_t n,
                       float* out) {
    uint64_t s = *state;
    const uint64_t c = *inc;
    for (uint64_t i = 0; i < n; ++i) {
        uint32_t bits = (pcg32_output(s) >> 9) | 0x3f800000u;
        float f;
        std::memcpy(&f, &bits, sizeof(f));
        out[i] = f - 1.0f;
        s = s * PCG32_MULT + c;
    }
    *state = s;
}

} // extern "C"
