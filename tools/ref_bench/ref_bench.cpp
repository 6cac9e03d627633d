// Reference CPU baseline harness for microsoft/SEAL, mirroring the op
// taxonomy of native/bench/{keygen,bfv,bgv,ckks,ntt}.cpp (registration
// native/bench/bench.cpp:135-226) without the google-benchmark dependency
// (unavailable offline).  Fixed iteration count, microsecond units, warm-up
// pass — same conventions as the reference harness (bench.cpp:20-26).
//
// Output: JSON on stdout, shape {scheme: {n: {op: us}}}.
//
// Build (after building libseal, see tools/wire_compat/build.sh header):
//   g++ -std=c++17 -O2 -I$REF/native/src -I$BUILD/native/src \
//     tools/ref_bench/ref_bench.cpp $BUILD/lib/libseal-4.4.a -o /tmp/ref_bench
#include "seal/seal.h"
#include "seal/util/ntt.h"
#include "seal/util/polycore.h"

#include <chrono>
#include <cstdio>
#include <functional>
#include <map>
#include <string>
#include <vector>

using namespace seal;
using namespace std;

static double time_us(const function<void()> &fn, int iters)
{
    fn(); // warm-up (reference --no-warmup default off: bench.cpp:34-101)
    auto t0 = chrono::steady_clock::now();
    for (int i = 0; i < iters; i++)
        fn();
    auto t1 = chrono::steady_clock::now();
    return chrono::duration<double, micro>(t1 - t0).count() / iters;
}

struct Out
{
    map<string, map<string, map<string, double>>> v;
    void put(const string &scheme, size_t n, const string &op, double us)
    {
        v[scheme][to_string(n)][op] = us;
        fprintf(stderr, "%s n=%zu %s: %.1f us\n", scheme.c_str(), n, op.c_str(), us);
    }
    void dump()
    {
        printf("{");
        bool c1 = false;
        for (auto &s : v)
        {
            printf("%s\"%s\":{", c1 ? "," : "", s.first.c_str());
            c1 = true;
            bool c2 = false;
            for (auto &nn : s.second)
            {
                printf("%s\"%s\":{", c2 ? "," : "", nn.first.c_str());
                c2 = true;
                bool c3 = false;
                for (auto &op : nn.second)
                {
                    printf("%s\"%s\":%.3f", c3 ? "," : "", op.first.c_str(), op.second);
                    c3 = true;
                }
                printf("}");
            }
            printf("}");
        }
        printf("}\n");
    }
};

int main(int argc, char **argv)
{
    int iters = 10;
    vector<size_t> sizes = { 1024, 2048, 4096, 8192, 16384, 32768 };
    if (argc > 1)
    {
        sizes.clear();
        char *tok = strtok(argv[1], ",");
        while (tok)
        {
            sizes.push_back(strtoul(tok, nullptr, 10));
            tok = strtok(nullptr, ",");
        }
    }
    Out out;
    for (size_t n : sizes)
    {
        auto coeff = CoeffModulus::BFVDefault(n); // default 128-bit chain (globals.cpp:21-74)

        // ---------------- KeyGen + NTT (CKKS-parms env, as bench.cpp) ----
        {
            EncryptionParameters parms(scheme_type::ckks);
            parms.set_poly_modulus_degree(n);
            parms.set_coeff_modulus(coeff);
            SEALContext ctx(parms, true, sec_level_type::tc128);
            KeyGenerator keygen(ctx);
            out.put("keygen", n, "secret", time_us([&] { KeyGenerator kg(ctx); }, iters));
            PublicKey pk;
            out.put("keygen", n, "public", time_us([&] { keygen.create_public_key(pk); }, iters));
            if (ctx.using_keyswitching())
            {
                RelinKeys rlk;
                out.put("keygen", n, "relin", time_us([&] { keygen.create_relin_keys(rlk); }, iters));
                GaloisKeys glk;
                out.put(
                    "keygen", n, "galois_one_step",
                    time_us([&] { keygen.create_galois_keys(vector<int>{ 1 }, glk); }, iters));
            }

            // NTT microbench over the chain's first-level limbs (bench/ntt.cpp)
            auto cd = ctx.first_context_data();
            auto tables = cd->small_ntt_tables();
            size_t k = cd->parms().coeff_modulus().size();
            auto pool = MemoryManager::GetPool();
            auto poly = util::allocate_poly_array(1, n, k, pool);
            for (size_t j = 0; j < k * n; j++)
                poly[j] = j % cd->parms().coeff_modulus()[j / n].value();
            out.put("ntt", n, "forward", time_us(
                                             [&] {
                                                 for (size_t j = 0; j < k; j++)
                                                     util::ntt_negacyclic_harvey(poly.get() + j * n, tables[j]);
                                             },
                                             iters));
            out.put("ntt", n, "inverse", time_us(
                                             [&] {
                                                 for (size_t j = 0; j < k; j++)
                                                     util::inverse_ntt_negacyclic_harvey(poly.get() + j * n, tables[j]);
                                             },
                                             iters));
        }

        // ---------------- per-scheme op taxonomy -------------------------
        for (string scheme : { "bfv", "bgv", "ckks" })
        {
            scheme_type st = scheme == "bfv" ? scheme_type::bfv
                             : scheme == "bgv" ? scheme_type::bgv
                                               : scheme_type::ckks;
            EncryptionParameters parms(st);
            parms.set_poly_modulus_degree(n);
            parms.set_coeff_modulus(coeff);
            if (st != scheme_type::ckks)
                parms.set_plain_modulus(PlainModulus::Batching(n, 20)); // bench.cpp:110,117
            SEALContext ctx(parms, true, sec_level_type::tc128);
            KeyGenerator keygen(ctx);
            PublicKey pk;
            keygen.create_public_key(pk);
            Encryptor enc(ctx, pk, keygen.secret_key());
            Decryptor dec(ctx, keygen.secret_key());
            Evaluator ev(ctx);
            RelinKeys rlk;
            GaloisKeys glk;
            bool ks = ctx.using_keyswitching();
            if (ks)
            {
                keygen.create_relin_keys(rlk);
                keygen.create_galois_keys(vector<int>{ 1 }, glk);
            }

            Plaintext plain;
            double scale = 0;
            if (st == scheme_type::ckks)
            {
                CKKSEncoder encoder(ctx);
                vector<double> vals(encoder.slot_count());
                for (size_t i = 0; i < vals.size(); i++)
                    vals[i] = double(i) / double(vals.size());
                scale = sqrt(double(parms.coeff_modulus().back().value()));
                out.put(scheme, n, "encode", time_us([&] { encoder.encode(vals, scale, plain); }, iters));
                Plaintext tmp = plain;
                vector<double> got;
                out.put(scheme, n, "decode", time_us([&] { encoder.decode(tmp, got); }, iters));
            }
            else
            {
                BatchEncoder encoder(ctx);
                vector<uint64_t> vals(encoder.slot_count());
                for (size_t i = 0; i < vals.size(); i++)
                    vals[i] = i;
                out.put(scheme, n, "encode", time_us([&] { encoder.encode(vals, plain); }, iters));
                Plaintext tmp = plain;
                vector<uint64_t> got;
                out.put(scheme, n, "decode", time_us([&] { encoder.decode(tmp, got); }, iters));
            }

            Ciphertext c1, c2, c3;
            enc.encrypt(plain, c1);
            enc.encrypt(plain, c2);
            out.put(scheme, n, "encrypt", time_us([&] { enc.encrypt(plain, c3); }, iters));
            out.put(scheme, n, "encrypt_symmetric", time_us([&] { enc.encrypt_symmetric(plain, c3); }, iters));
            Plaintext pt_out;
            out.put(scheme, n, "decrypt", time_us([&] { dec.decrypt(c1, pt_out); }, iters));

            Ciphertext t;
            out.put(scheme, n, "add", time_us([&] { ev.add(c1, c2, t); }, iters));
            out.put(scheme, n, "sub", time_us([&] { ev.sub(c1, c2, t); }, iters));
            out.put(scheme, n, "negate", time_us([&] { ev.negate(c1, t); }, iters));
            out.put(scheme, n, "add_plain", time_us([&] { ev.add_plain(c1, plain, t); }, iters));

            // multiply_plain: NTT-form fast path for CKKS/BGV (cts NTT-resident),
            // coefficient path for BFV — same split the reference bench hits.
            if (st == scheme_type::ckks)
            {
                out.put(scheme, n, "multiply_plain", time_us([&] { ev.multiply_plain(c1, plain, t); }, iters));
            }
            else
            {
                out.put(scheme, n, "multiply_plain", time_us([&] { ev.multiply_plain(c1, plain, t); }, iters));
            }

            Ciphertext prod;
            ev.multiply(c1, c2, prod);
            out.put(scheme, n, "multiply", time_us([&] { ev.multiply(c1, c2, t); }, iters));
            out.put(scheme, n, "square", time_us([&] { ev.square(c1, t); }, iters));

            if (ks)
            {
                out.put(scheme, n, "relinearize", time_us([&] { ev.relinearize(prod, rlk, t); }, iters));
                if (st == scheme_type::ckks)
                {
                    out.put(scheme, n, "rescale", time_us([&] { ev.rescale_to_next(c1, t); }, iters));
                    out.put(scheme, n, "rotate_one_step", time_us([&] { ev.rotate_vector(c1, 1, glk, t); }, iters));
                }
                else
                {
                    out.put(scheme, n, "mod_switch", time_us([&] { ev.mod_switch_to_next(c1, t); }, iters));
                    out.put(scheme, n, "rotate_rows_one_step", time_us([&] { ev.rotate_rows(c1, 1, glk, t); }, iters));
                }
            }
            if (st == scheme_type::bfv)
            {
                Ciphertext cntt;
                out.put(scheme, n, "to_ntt", time_us([&] { ev.transform_to_ntt(c1, cntt); }, iters));
                ev.transform_to_ntt(c1, cntt);
                out.put(scheme, n, "from_ntt", time_us([&] { ev.transform_from_ntt(cntt, t); }, iters));
            }
        }
    }
    out.dump();
    return 0;
}
