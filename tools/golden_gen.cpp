// Golden-vector generator: drives the *reference* fun_ofdm sources
// (compiled from /root/reference/src with boost-crc and fftw3 shims) and
// dumps raw binary vectors that tests/golden/*.npz are built from.
//
// Usage: golden_gen <outdir>
// Emits, per rate r in 0..10:
//   ppdu_r<r>.c128      - ppdu::encode() samples for a fixed payload
//   frame_r<r>.c128     - frame_builder::build_frame() samples
//   demod_r<r>.u8       - modulator::demodulate() soft bits for noisy symbols
//   decode_r<r>.u8      - decoded payload via the full RX block chain
// Plus:
//   vit_soft.u8 / vit_bits.u8   - viterbi conv_decode on noisy soft input
//   sim_payloads.u8 / sim_count - test_sim-style 100-frame loopback result
//
// This tool is test infrastructure only; nothing here ships in the
// framework. It exists so the JAX implementation is validated against the
// actual reference algorithms, not just our reading of them.

#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include "channel_est.h"
#include "fft_symbols.h"
#include "frame_builder.h"
#include "frame_decoder.h"
#include "frame_detector.h"
#include "interleaver.h"
#include "modulator.h"
#include "phase_tracker.h"
#include "ppdu.h"
#include "puncturer.h"
#include "rates.h"
#include "timing_sync.h"
#include "viterbi.h"

using namespace fun;
using cd = std::complex<double>;

static void dump(const std::string &path, const void *data, size_t bytes) {
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) { perror(path.c_str()); exit(1); }
  fwrite(data, 1, bytes, f);
  fclose(f);
}

static std::vector<unsigned char> make_payload(int len, unsigned seed) {
  std::mt19937 rng(seed);
  std::vector<unsigned char> p(len);
  for (int i = 0; i < len; ++i) p[i] = rng() & 0xFF;
  return p;
}

// Run the full 6-block RX chain sequentially on 4096-sample chunks.
// Sequential per-chunk execution produces the same outputs as the
// reference's barrier-pipelined receiver_chain (the pipeline staggers
// *when* data flows, not *what* each block computes).
static std::vector<std::vector<unsigned char>> run_chain(
    const std::vector<cd> &stream) {
  frame_detector det;
  timing_sync sync;
  fft_symbols fft;
  channel_est chan;
  phase_tracker phase;
  frame_decoder dec;
  std::vector<std::vector<unsigned char>> out;

  const size_t chunk = 4096;
  for (size_t x = 0; x < stream.size(); x += chunk) {
    size_t end = std::min(stream.size(), x + chunk);
    det.input_buffer.assign(stream.begin() + x, stream.begin() + end);
    det.work();
    sync.input_buffer.swap(det.output_buffer);
    sync.work();
    fft.input_buffer.swap(sync.output_buffer);
    fft.work();
    chan.input_buffer.swap(fft.output_buffer);
    chan.work();
    phase.input_buffer.swap(chan.output_buffer);
    phase.work();
    dec.input_buffer.swap(phase.output_buffer);
    dec.work();
    for (auto &p : dec.output_buffer) out.push_back(p);
    dec.output_buffer.clear();
  }
  return out;
}

int main(int argc, char **argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s outdir | --chain in.c128 out.bin\n", argv[0]); return 1; }

  // --chain mode: run the compiled REFERENCE RX chain on an arbitrary
  // complex128 sample stream (e.g. AWGN-impaired; tools/ref_compare.py)
  // and dump every delivered payload as uint32 length + bytes. This is
  // what makes a head-to-head reference-vs-ours PER comparison possible
  // on identical noisy samples.
  if (std::string(argv[1]) == "--chain") {
    if (argc < 4) { fprintf(stderr, "--chain in.c128 out.bin\n"); return 1; }
    FILE *f = fopen(argv[2], "rb");
    if (!f) { perror(argv[2]); return 1; }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<cd> stream(bytes / sizeof(cd));
    if (fread(stream.data(), sizeof(cd), stream.size(), f)
        != stream.size()) { fclose(f); return 1; }
    fclose(f);
    auto frames = run_chain(stream);
    FILE *o = fopen(argv[3], "wb");
    if (!o) { perror(argv[3]); return 1; }
    for (auto &fr : frames) {
      uint32_t n = (uint32_t)fr.size();
      fwrite(&n, sizeof(n), 1, o);
      fwrite(fr.data(), 1, fr.size(), o);
    }
    fclose(o);
    fprintf(stderr, "chain decoded %zu packets\n", frames.size());
    return 0;
  }

  std::string outdir = argv[1];

  // --- per-rate ppdu/frame/demod/chain vectors ---
  frame_builder fb;
  for (int r = 0; r <= 10; ++r) {
    Rate rate = (Rate)r;
    std::vector<unsigned char> payload = make_payload(120, 1000 + r);

    ppdu p(payload, rate);
    std::vector<cd> samples = p.encode();
    dump(outdir + "/ppdu_r" + std::to_string(r) + ".c128",
         samples.data(), samples.size() * sizeof(cd));

    std::vector<cd> frame = fb.build_frame(payload, rate);
    dump(outdir + "/frame_r" + std::to_string(r) + ".c128",
         frame.data(), frame.size() * sizeof(cd));

    // demodulate noisy constellation points
    std::mt19937 rng(77 + r);
    std::normal_distribution<double> gauss(0.0, 0.08);
    std::vector<cd> noisy(96);
    RateParams rp(rate);
    for (auto &s : noisy) {
      // random point near the constellation grid
      std::uniform_int_distribution<int> bit(0, 1);
      s = cd(gauss(rng) + (bit(rng) ? 1 : -1) * 0.6, gauss(rng));
    }
    std::vector<unsigned char> soft = modulator::demodulate(noisy, rate);
    dump(outdir + "/demod_in_r" + std::to_string(r) + ".c128",
         noisy.data(), noisy.size() * sizeof(cd));
    dump(outdir + "/demod_r" + std::to_string(r) + ".u8",
         soft.data(), soft.size());

    // full RX chain: 200 zeros | frame | 6000 zeros
    std::vector<cd> stream(200, cd(0, 0));
    stream.insert(stream.end(), frame.begin(), frame.end());
    stream.insert(stream.end(), 6000, cd(0, 0));
    auto frames = run_chain(stream);
    std::vector<unsigned char> flat;
    for (auto &fr : frames)
      flat.insert(flat.end(), fr.begin(), fr.end());
    dump(outdir + "/decode_r" + std::to_string(r) + ".u8",
         flat.data(), flat.size());
  }

  // --- viterbi soft-decision vectors ---
  {
    int nbits = 800;
    std::vector<unsigned char> data = make_payload((nbits + 6 + 7) / 8, 42);
    std::vector<unsigned char> coded(2 * (nbits + 6));
    viterbi v;
    v.conv_encode(data.data(), coded.data(), nbits);
    dump(outdir + "/vit_data.u8", data.data(), data.size());
    dump(outdir + "/vit_coded.u8", coded.data(), coded.size());

    std::mt19937 rng(7);
    std::normal_distribution<double> gauss(0.0, 70.0);
    std::vector<unsigned char> soft(coded.size());
    for (size_t i = 0; i < coded.size(); ++i) {
      double val = (coded[i] ? 255.0 : 0.0) + gauss(rng);
      soft[i] = (unsigned char)(val < 0 ? 0 : (val > 255 ? 255 : val));
    }
    std::vector<unsigned char> decoded(data.size());
    v.conv_decode(soft.data(), decoded.data(), nbits);
    dump(outdir + "/vit_soft.u8", soft.data(), soft.size());
    dump(outdir + "/vit_bits.u8", decoded.data(), decoded.size());
  }

  // --- test_sim loopback: 100 identical 1500-B frames at RATE_3_4_QAM16 ---
  {
    std::string s = "I'm a little tea pot, short and stout.....here is my "
                    "handle.....blah blah blah.....this rhyme sucks!";
    std::vector<unsigned char> payload;
    for (int i = 0; i < 15; ++i)
      payload.insert(payload.end(), s.begin(), s.end());
    std::vector<cd> frame = fb.build_frame(payload, RATE_3_4_QAM16);
    std::vector<cd> stream;
    for (int i = 0; i < 100; ++i)
      stream.insert(stream.end(), frame.begin(), frame.end());
    stream.insert(stream.end(), frame.size(), cd(0, 0));  // flush
    auto frames = run_chain(stream);
    int count = (int)frames.size();
    std::vector<unsigned char> flat;
    for (auto &fr : frames) flat.insert(flat.end(), fr.begin(), fr.end());
    dump(outdir + "/sim_payloads.u8", flat.data(), flat.size());
    dump(outdir + "/sim_count.u8", &count, sizeof(int));
    fprintf(stderr, "sim received %d packets\n", count);
  }

  return 0;
}
