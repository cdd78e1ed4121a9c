// BCn block-compression decoder (BC1/BC2/BC3/BC4/BC5).
//
// Native counterpart of the reference's texture path: ZetaRay ships
// BC-compressed DDS textures (Tools/BCnCompressglTF) and decodes them in
// hardware; TPUs have no BC decode, so this module expands blocks to RGBA8
// on the host at scene-load time (SURVEY.md section 7 "native-hot").
//
// Build: g++ -O2 -shared -fPIC -o libbcdec.so bcdec.cpp
// ABI: plain C, bound from Python via ctypes (zetaray_tpu/native).

#include <cstdint>
#include <cstring>

namespace {

inline void decode_color_block(const uint8_t* b, uint8_t out[16][4], bool bc1) {
    const uint16_t c0 = uint16_t(b[0] | (b[1] << 8));
    const uint16_t c1 = uint16_t(b[2] | (b[3] << 8));
    uint8_t pal[4][4];
    auto expand = [](uint16_t c, uint8_t* rgb) {
        rgb[0] = uint8_t(((c >> 11) & 31) * 255 / 31);
        rgb[1] = uint8_t(((c >> 5) & 63) * 255 / 63);
        rgb[2] = uint8_t((c & 31) * 255 / 31);
    };
    expand(c0, pal[0]);
    expand(c1, pal[1]);
    pal[0][3] = pal[1][3] = 255;
    if (!bc1 || c0 > c1) {
        for (int k = 0; k < 3; ++k) {
            pal[2][k] = uint8_t((2 * pal[0][k] + pal[1][k]) / 3);
            pal[3][k] = uint8_t((pal[0][k] + 2 * pal[1][k]) / 3);
        }
        pal[2][3] = pal[3][3] = 255;
    } else {
        for (int k = 0; k < 3; ++k) {
            pal[2][k] = uint8_t((pal[0][k] + pal[1][k]) / 2);
            pal[3][k] = 0;
        }
        pal[2][3] = 255;
        pal[3][3] = 0;  // 1-bit transparent black
    }
    const uint32_t idx = uint32_t(b[4]) | (uint32_t(b[5]) << 8) |
                         (uint32_t(b[6]) << 16) | (uint32_t(b[7]) << 24);
    for (int t = 0; t < 16; ++t) {
        const uint32_t s = (idx >> (2 * t)) & 3;
        std::memcpy(out[t], pal[s], 4);
    }
}

inline void decode_alpha_block_bc3(const uint8_t* b, uint8_t out[16]) {
    const uint8_t a0 = b[0], a1 = b[1];
    uint8_t pal[8];
    pal[0] = a0;
    pal[1] = a1;
    if (a0 > a1) {
        for (int k = 1; k < 7; ++k)
            pal[k + 1] = uint8_t(((7 - k) * a0 + k * a1) / 7);
    } else {
        for (int k = 1; k < 5; ++k)
            pal[k + 1] = uint8_t(((5 - k) * a0 + k * a1) / 5);
        pal[6] = 0;
        pal[7] = 255;
    }
    uint64_t bits = 0;
    for (int k = 0; k < 6; ++k) bits |= uint64_t(b[2 + k]) << (8 * k);
    for (int t = 0; t < 16; ++t) out[t] = pal[(bits >> (3 * t)) & 7];
}

// Write a decoded 4x4 block into the output image (RGBA8, row-major).
inline void store_block(uint8_t* img, int w, int h, int bx, int by,
                        const uint8_t px[16][4]) {
    for (int y = 0; y < 4; ++y) {
        const int iy = by * 4 + y;
        if (iy >= h) break;
        for (int x = 0; x < 4; ++x) {
            const int ix = bx * 4 + x;
            if (ix >= w) break;
            std::memcpy(img + 4 * (size_t(iy) * w + ix), px[4 * y + x], 4);
        }
    }
}

}  // namespace

extern "C" {

// blocks: compressed data; w, h: image dims; out: RGBA8 [h * w * 4].
void bc1_decode(const uint8_t* blocks, int w, int h, uint8_t* out) {
    const int bw = (w + 3) / 4, bh = (h + 3) / 4;
    for (int by = 0; by < bh; ++by)
        for (int bx = 0; bx < bw; ++bx) {
            uint8_t px[16][4];
            decode_color_block(blocks + 8 * (size_t(by) * bw + bx), px, true);
            store_block(out, w, h, bx, by, px);
        }
}

void bc2_decode(const uint8_t* blocks, int w, int h, uint8_t* out) {
    const int bw = (w + 3) / 4, bh = (h + 3) / 4;
    for (int by = 0; by < bh; ++by)
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* b = blocks + 16 * (size_t(by) * bw + bx);
            uint8_t px[16][4];
            decode_color_block(b + 8, px, false);
            for (int t = 0; t < 16; ++t) {
                const uint8_t nib = (b[t / 2] >> (4 * (t & 1))) & 15;
                px[t][3] = uint8_t(nib * 17);
            }
            store_block(out, w, h, bx, by, px);
        }
}

void bc3_decode(const uint8_t* blocks, int w, int h, uint8_t* out) {
    const int bw = (w + 3) / 4, bh = (h + 3) / 4;
    for (int by = 0; by < bh; ++by)
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* b = blocks + 16 * (size_t(by) * bw + bx);
            uint8_t px[16][4];
            uint8_t alpha[16];
            decode_color_block(b + 8, px, false);
            decode_alpha_block_bc3(b, alpha);
            for (int t = 0; t < 16; ++t) px[t][3] = alpha[t];
            store_block(out, w, h, bx, by, px);
        }
}

void bc4_decode(const uint8_t* blocks, int w, int h, uint8_t* out) {
    // single channel -> R, GB = 0, A = 255
    const int bw = (w + 3) / 4, bh = (h + 3) / 4;
    for (int by = 0; by < bh; ++by)
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* b = blocks + 8 * (size_t(by) * bw + bx);
            uint8_t r[16];
            decode_alpha_block_bc3(b, r);
            uint8_t px[16][4];
            for (int t = 0; t < 16; ++t) {
                px[t][0] = r[t];
                px[t][1] = 0;
                px[t][2] = 0;
                px[t][3] = 255;
            }
            store_block(out, w, h, bx, by, px);
        }
}

void bc5_decode(const uint8_t* blocks, int w, int h, uint8_t* out) {
    const int bw = (w + 3) / 4, bh = (h + 3) / 4;
    for (int by = 0; by < bh; ++by)
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* b = blocks + 16 * (size_t(by) * bw + bx);
            uint8_t r[16], g[16];
            decode_alpha_block_bc3(b, r);
            decode_alpha_block_bc3(b + 8, g);
            uint8_t px[16][4];
            for (int t = 0; t < 16; ++t) {
                px[t][0] = r[t];
                px[t][1] = g[t];
                px[t][2] = 0;
                px[t][3] = 255;
            }
            store_block(out, w, h, bx, by, px);
        }
}

}  // extern "C"
