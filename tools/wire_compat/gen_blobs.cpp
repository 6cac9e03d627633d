// Wire-compatibility blob generator against the reference implementation.
//
// Builds small insecure contexts for BFV/BGV/CKKS with a FIXED blake2xb PRNG
// seed, and writes every serializable object (parameters, keys, plaintexts,
// ciphertexts, seeded ciphertexts, seeded keys) plus a manifest of expected
// values to a directory.  The seal_tpu test suite loads these blobs and
// asserts byte-level/functional parity (tests/test_wire_compat.py).
//
// Usage:   gen_blobs <outdir>
// Build:   see tools/wire_compat/build.sh
//
// Reference anchors: serialization.h:58-97 (SEALHeader), ciphertext.cpp:190-
// 247 (save_members incl. seed branch), rlwe.cpp:277-407 (seeded symmetric
// encryption), keygenerator.h create_*_keys (Serializable keys).

#include "seal/seal.h"
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

using namespace seal;
using namespace std;

static void dump(const string &path, const stringstream &ss)
{
    ofstream f(path, ios::binary);
    const string s = ss.str();
    f.write(s.data(), (streamsize)s.size());
}

template <typename T> static void save_obj(const T &obj, const string &path)
{
    stringstream ss;
    obj.save(ss, compr_mode_type::none);
    dump(path, ss);
}

template <typename T> static void save_compressed(const T &obj, const string &base)
{
#ifdef SEAL_USE_ZLIB
    {
        stringstream ss;
        obj.save(ss, compr_mode_type::zlib);
        dump(base + "_zlib.bin", ss);
    }
#endif
#ifdef SEAL_USE_ZSTD
    {
        stringstream ss;
        obj.save(ss, compr_mode_type::zstd);
        dump(base + "_zstd.bin", ss);
    }
#endif
}

static prng_seed_type fixed_seed()
{
    prng_seed_type seed{};
    for (size_t i = 0; i < seed.size(); i++)
        seed[i] = 0x1111111111111111ULL * (i + 1);
    return seed;
}

int main(int argc, char **argv)
{
    if (argc < 2)
    {
        cerr << "usage: gen_blobs <outdir>" << endl;
        return 1;
    }
    const string out = string(argv[1]) + "/";
    ofstream manifest(out + "manifest.txt");

    // ---------------- BFV (N=64, 3x30-bit primes, t=257) ----------------
    {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, {30, 30, 30}));
        parms.set_plain_modulus(257); // 257 = 1 mod 128 -> batching
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(fixed_seed()));
        save_obj(parms, out + "bfv_parms.bin");

        SEALContext context(parms, true, sec_level_type::none);
        KeyGenerator keygen(context);
        const SecretKey &sk = keygen.secret_key();
        PublicKey pk;
        keygen.create_public_key(pk);
        RelinKeys rlk;
        keygen.create_relin_keys(rlk);
        GaloisKeys glk;
        keygen.create_galois_keys(vector<int>{1, -1}, glk);
        save_obj(sk, out + "bfv_sk.bin");
        save_obj(pk, out + "bfv_pk.bin");
        save_obj(rlk, out + "bfv_rlk.bin");
        save_obj(glk, out + "bfv_glk.bin");

        // Seeded (Serializable) relin keys + galois keys
        save_obj(keygen.create_relin_keys(), out + "bfv_rlk_seeded.bin");
        save_obj(keygen.create_galois_keys(vector<int>{1}), out + "bfv_glk_seeded.bin");

        Plaintext plain("3x^5 + 2x^3 + 1x^1 + 5");
        save_obj(plain, out + "bfv_pt.bin");
        manifest << "bfv_pt_hex " << plain.to_string() << "\n";

        Encryptor encryptor(context, pk);
        encryptor.set_secret_key(sk);
        Ciphertext ct;
        encryptor.encrypt(plain, ct);
        save_obj(ct, out + "bfv_ct.bin");
        // compressed variants of the SAME ciphertext (serialization.h:23;
        // zlib/zstd streaming in ztools.cpp:101-300) — the round-3 check that
        // compressed reference streams load, not just compr_mode none
        save_compressed(ct, out + "bfv_ct");
        save_compressed(sk, out + "bfv_sk");

        // seeded symmetric ciphertext (half size, PRNG info stored)
        save_obj(encryptor.encrypt_symmetric(plain), out + "bfv_ct_seeded.bin");

        // homomorphic result for functional parity: (ct*ct relin) + ct
        Evaluator evaluator(context);
        Ciphertext prod;
        evaluator.multiply(ct, ct, prod);
        evaluator.relinearize_inplace(prod, rlk);
        evaluator.add_inplace(prod, ct);
        save_obj(prod, out + "bfv_ct_prod.bin");
        Decryptor decryptor(context, sk);
        Plaintext dec;
        decryptor.decrypt(prod, dec);
        manifest << "bfv_prod_hex " << dec.to_string() << "\n";
    }

    // ---------------- BGV (N=64, 3x30-bit primes, t=257) ----------------
    {
        EncryptionParameters parms(scheme_type::bgv);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, {30, 30, 30}));
        parms.set_plain_modulus(257);
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(fixed_seed()));
        save_obj(parms, out + "bgv_parms.bin");

        SEALContext context(parms, true, sec_level_type::none);
        KeyGenerator keygen(context);
        const SecretKey &sk = keygen.secret_key();
        PublicKey pk;
        keygen.create_public_key(pk);
        save_obj(sk, out + "bgv_sk.bin");
        save_obj(pk, out + "bgv_pk.bin");

        Plaintext plain("6x^7 + 4x^2 + 2");
        Encryptor encryptor(context, pk);
        encryptor.set_secret_key(sk);
        Ciphertext ct;
        encryptor.encrypt(plain, ct);
        save_obj(ct, out + "bgv_ct.bin");
        save_obj(encryptor.encrypt_symmetric(plain), out + "bgv_ct_seeded.bin");
        manifest << "bgv_pt_hex " << plain.to_string() << "\n";
    }

    // ---------------- CKKS (N=64, 30/30/30 primes) ----------------
    {
        EncryptionParameters parms(scheme_type::ckks);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, {30, 30, 30}));
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(fixed_seed()));
        save_obj(parms, out + "ckks_parms.bin");

        SEALContext context(parms, true, sec_level_type::none);
        KeyGenerator keygen(context);
        const SecretKey &sk = keygen.secret_key();
        PublicKey pk;
        keygen.create_public_key(pk);
        save_obj(sk, out + "ckks_sk.bin");
        save_obj(pk, out + "ckks_pk.bin");

        CKKSEncoder encoder(context);
        vector<double> vals(encoder.slot_count());
        for (size_t i = 0; i < vals.size(); i++)
            vals[i] = 0.25 * (double)i - 3.0;
        Plaintext plain;
        encoder.encode(vals, pow(2.0, 20), plain);
        save_obj(plain, out + "ckks_pt.bin");
        for (size_t i = 0; i < vals.size(); i++)
            manifest << "ckks_val " << i << " " << vals[i] << "\n";

        Encryptor encryptor(context, pk);
        encryptor.set_secret_key(sk);
        Ciphertext ct;
        encryptor.encrypt(plain, ct);
        save_obj(ct, out + "ckks_ct.bin");
        save_obj(encryptor.encrypt_symmetric(plain), out + "ckks_ct_seeded.bin");
    }

    // ---------------- BFV at N=4096 (production-shaped, default chain) ----
    // Round-2 review: all wire blobs were toy N=64; this set proves byte
    // compatibility at a real parameter point (globals.cpp:43 chain).
    {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(4096);
        parms.set_coeff_modulus(CoeffModulus::BFVDefault(4096));
        parms.set_plain_modulus(PlainModulus::Batching(4096, 20));
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(fixed_seed()));
        save_obj(parms, out + "bfv4096_parms.bin");

        SEALContext context(parms, true, sec_level_type::tc128);
        KeyGenerator keygen(context);
        const SecretKey &sk = keygen.secret_key();
        PublicKey pk;
        keygen.create_public_key(pk);
        GaloisKeys glk;
        keygen.create_galois_keys(vector<int>{ 1 }, glk);
        save_obj(sk, out + "bfv4096_sk.bin");
        save_obj(pk, out + "bfv4096_pk.bin");
        save_obj(glk, out + "bfv4096_glk.bin");

        BatchEncoder encoder(context);
        vector<uint64_t> vals(encoder.slot_count());
        for (size_t i = 0; i < vals.size(); i++)
            vals[i] = (3 * i + 7) % parms.plain_modulus().value();
        Plaintext plain;
        encoder.encode(vals, plain);
        Encryptor encryptor(context, pk);
        encryptor.set_secret_key(sk);
        Ciphertext ct;
        encryptor.encrypt(plain, ct);
        save_obj(ct, out + "bfv4096_ct.bin");
        save_compressed(ct, out + "bfv4096_ct");
        Evaluator evaluator(context);
        Ciphertext rot;
        evaluator.rotate_rows(ct, 1, glk, rot);
        Decryptor decryptor(context, sk);
        Plaintext dec;
        decryptor.decrypt(rot, dec);
        vector<uint64_t> got;
        encoder.decode(dec, got);
        // record first 8 rotated slots for the functional assert
        for (size_t i = 0; i < 8; i++)
            manifest << "bfv4096_rot_slot " << i << " " << got[i] << "\n";
    }

    manifest.close();
    cout << "wrote blobs to " << out << endl;
    return 0;
}
