// Generate fixed-seed reference vectors for the SEAL 3.4 / 3.5 legacy
// uniform samplers (util/rlwe.cpp:134-188), used by
// tests/test_legacy_samplers.py to pin seal_tpu.random.sampler's
// sample_poly_uniform_seal_3_4 / _3_5 byte-for-byte.
//
// Usage:   gen_legacy_sampler_vectors <outdir>
// Build:   g++ -std=c++17 -O2 -I$REF/native/src -I$BUILD/native/src \
//            gen_legacy_sampler_vectors.cpp $BUILD/lib/libseal-4.4.a \
//            -o gen_legacy_sampler_vectors
// (tools/wire_compat/build.sh builds it alongside gen_blobs.)

#include "seal/randomgen.h"
#include "seal/seal.h"
#include "seal/util/rlwe.h"
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

using namespace seal;
using namespace std;

static void write_u64s(const string &path, const vector<uint64_t> &v)
{
    ofstream f(path, ios::binary);
    f.write(reinterpret_cast<const char *>(v.data()), (streamsize)(v.size() * 8));
}

int main(int argc, char **argv)
{
    if (argc != 2)
    {
        fprintf(stderr, "usage: %s <outdir>\n", argv[0]);
        return 2;
    }
    string outdir = argv[1];

    // Small insecure parameter set exercising both a tiny and a large prime
    // (rejection paths differ with modulus magnitude).
    EncryptionParameters parms(scheme_type::bfv);
    size_t n = 64;
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, { 30, 50 }));
    parms.set_plain_modulus(257);

    prng_seed_type seed{ 0x5EA1, 1, 2, 3, 4, 5, 6, 7 };
    size_t k = parms.coeff_modulus().size();

    {
        auto prng = Blake2xbPRNGFactory(seed).create();
        vector<uint64_t> dest(k * n);
        util::sample_poly_uniform_seal_3_4(prng, parms, dest.data());
        write_u64s(outdir + "/legacy_uniform_3_4.bin", dest);
    }
    {
        auto prng = Blake2xbPRNGFactory(seed).create();
        vector<uint64_t> dest(k * n);
        util::sample_poly_uniform_seal_3_5(prng, parms, dest.data());
        write_u64s(outdir + "/legacy_uniform_3_5.bin", dest);
    }

    // Moduli values so the Python side reconstructs the exact base.
    {
        ofstream f(outdir + "/legacy_uniform_moduli.txt");
        for (auto &m : parms.coeff_modulus())
            f << m.value() << "\n";
    }
    printf("wrote legacy sampler vectors to %s\n", outdir.c_str());
    return 0;
}
