// Reverse-direction wire check: load seal_tpu-produced blobs with the
// REFERENCE implementation and decrypt/decode them, printing results to
// stdout for tests/test_wire_compat.py to assert.
//
// Usage: verify_blobs <dir>
//   expects <dir>/{scheme}_parms.bin, _sk.bin, _ct.bin for scheme in
//   bfv,bgv,ckks (missing schemes are skipped).

#include "seal/seal.h"
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

using namespace seal;
using namespace std;

static bool slurp(const string &path, stringstream &ss)
{
    ifstream f(path, ios::binary);
    if (!f)
        return false;
    ss << f.rdbuf();
    return true;
}

int main(int argc, char **argv)
{
    if (argc < 2)
    {
        cerr << "usage: verify_blobs <dir>" << endl;
        return 1;
    }
    const string dir = string(argv[1]) + "/";

    for (const string scheme : { "bfv", "bgv", "ckks" })
    {
        stringstream ps;
        if (!slurp(dir + scheme + "_parms.bin", ps))
            continue;
        EncryptionParameters parms;
        parms.load(ps);
        SEALContext context(parms, true, sec_level_type::none);

        stringstream ks;
        if (!slurp(dir + scheme + "_sk.bin", ks))
            continue;
        SecretKey sk;
        sk.load(context, ks);
        Decryptor decryptor(context, sk);

        stringstream cs;
        if (!slurp(dir + scheme + "_ct.bin", cs))
            continue;
        Ciphertext ct;
        ct.load(context, cs);

        Plaintext pt;
        decryptor.decrypt(ct, pt);
        if (scheme == "ckks")
        {
            CKKSEncoder encoder(context);
            vector<double> vals;
            encoder.decode(pt, vals);
            for (size_t i = 0; i < vals.size(); i++)
                cout << scheme << "_val " << i << " " << vals[i] << "\n";
        }
        else
        {
            cout << scheme << "_hex " << pt.to_string() << "\n";
        }
    }
    return 0;
}
