// Fast Newick tree-list parser (C++17, zero dependencies).
//
// The prepare pipeline reads posterior tree lists with thousands of trees
// (reference: someTrees via attoparsec, lib/Mcmc/Tree/Import.hs).  This
// parser streams a file of one-Newick-per-line trees and emits, per tree,
// the branch lengths in PRE-ORDER (children left-to-right) — exactly the
// order produced by mcmcdate_tpu.tree.rose.Node.preorder() — plus, for the
// first tree, the topology (parent indices) and leaf names.
//
// Exposed as a C ABI for ctypes.  All trees must share the token structure
// of the first tree (same topology and sub-tree order); a mismatch sets an
// error and returns 0.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libnewick.so newick_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ParseResult {
  std::vector<double> lengths;        // n_trees * n_nodes
  std::vector<int32_t> parents;       // n_nodes (first tree)
  std::string names_blob;             // '\n'-joined node names (first tree)
  std::vector<uint64_t> struct_hashes;  // per-tree topology+label hash
  int64_t n_trees = 0;
  int64_t n_nodes = 0;
  std::string error;
};

// FNV-1a over the structural tokens (parens, commas, labels) — equal hashes
// across a tree list certify equal topology INCLUDING sub-tree order and
// labels, the reference's prepare requirement (app/Main.hs:182-190).
struct StructHash {
  uint64_t h = 1469598103934665603ull;
  void byte(char c) { h ^= (unsigned char)c; h *= 1099511628211ull; }
  void str(const std::string& s) {
    for (char c : s) byte(c);
    byte('\x1f');
  }
};

struct Parser {
  const char* p;
  const char* end;
  bool ok = true;
  std::string err;

  explicit Parser(const char* s, size_t n) : p(s), end(s + n) {}

  void fail(const std::string& msg) {
    if (ok) {
      ok = false;
      err = msg;
    }
  }

  void skip_comment() {
    // Square-bracket comments, possibly nested.
    int depth = 0;
    while (p < end) {
      if (*p == '[') depth++;
      else if (*p == ']') {
        depth--;
        if (depth == 0) { p++; return; }
      }
      p++;
    }
    fail("unbalanced comment");
  }

  void skip_ws() {
    while (p < end) {
      if (*p == ' ' || *p == '\t' || *p == '\r') p++;
      else if (*p == '[') skip_comment();
      else break;
    }
  }

  std::string label() {
    skip_ws();
    std::string out;
    if (p < end && *p == '\'') {
      p++;
      while (p < end) {
        if (*p == '\'') {
          if (p + 1 < end && p[1] == '\'') { out.push_back('\''); p += 2; continue; }
          p++;
          return out;
        }
        out.push_back(*p++);
      }
      fail("unterminated quoted label");
      return out;
    }
    while (p < end && !strchr("(),:;[]\n", *p)) out.push_back(*p++);
    // trim trailing spaces
    while (!out.empty() && (out.back() == ' ' || out.back() == '\t')) out.pop_back();
    return out;
  }

  double length() {
    skip_ws();
    if (p < end && *p == ':') {
      p++;
      skip_ws();
      char* q = nullptr;
      double v = strtod(p, &q);
      if (q == p) { fail("invalid branch length"); return 0.0; }
      p = q;
      return v;
    }
    return 0.0;
  }
};

// Recursive-descent parse; emits lengths in pre-order.  When `topo` is
// non-null, also records parents and names.
void parse_node(Parser& P, int32_t parent, std::vector<double>& lens,
                std::vector<int32_t>* parents, std::vector<std::string>* names,
                StructHash& sh) {
  if (!P.ok) return;
  P.skip_ws();
  int32_t my_index = (int32_t)lens.size();
  lens.push_back(0.0);  // placeholder; filled after label/length
  if (parents) parents->push_back(parent);
  if (names) names->push_back(std::string());

  if (P.p < P.end && *P.p == '(') {
    sh.byte('(');
    P.p++;
    while (true) {
      parse_node(P, my_index, lens, parents, names, sh);
      if (!P.ok) return;
      P.skip_ws();
      if (P.p < P.end && *P.p == ',') { sh.byte(','); P.p++; continue; }
      if (P.p < P.end && *P.p == ')') { sh.byte(')'); P.p++; break; }
      P.fail("unexpected character in group");
      return;
    }
  }
  std::string lb = P.label();
  sh.str(lb);
  if (names) (*names)[my_index] = lb;
  lens[my_index] = P.length();
}

ParseResult* parse_buffer(const char* data, size_t size) {
  auto* res = new ParseResult();
  const char* p = data;
  const char* end = data + size;
  bool first = true;
  std::vector<std::string> names;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
    const char* line_end = nl ? nl : end;
    // skip blank lines
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
    if (q == line_end) { p = nl ? nl + 1 : end; continue; }

    Parser P(p, (size_t)(line_end - p));
    size_t before = res->lengths.size();
    StructHash sh;
    if (first) {
      parse_node(P, -1, res->lengths, &res->parents, &names, sh);
    } else {
      parse_node(P, -1, res->lengths, nullptr, nullptr, sh);
    }
    res->struct_hashes.push_back(sh.h);
    if (!P.ok) {
      res->error = P.err + " (tree " + std::to_string(res->n_trees) + ")";
      return res;
    }
    P.skip_ws();
    if (P.p < P.end && *P.p == ';') P.p++;
    size_t count = res->lengths.size() - before;
    if (first) {
      res->n_nodes = (int64_t)count;
      for (size_t i = 0; i < names.size(); i++) {
        res->names_blob += names[i];
        res->names_blob.push_back('\n');
      }
      first = false;
    } else if ((int64_t)count != res->n_nodes) {
      res->error = "tree " + std::to_string(res->n_trees) +
                   " has a different number of nodes";
      return res;
    }
    res->n_trees++;
    p = nl ? nl + 1 : end;
  }
  if (res->n_trees == 0) res->error = "no trees found";
  return res;
}

}  // namespace

extern "C" {

// Parse a file; returns an opaque handle (never null).  Check
// newick_error() before using the data.
void* newick_parse_file(const char* path) {
  auto* res = new ParseResult();
  FILE* f = fopen(path, "rb");
  if (!f) {
    res->error = "cannot open file";
    return res;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    res->error = "short read";
    return res;
  }
  fclose(f);
  delete res;
  return parse_buffer(buf.data(), buf.size());
}

void* newick_parse_buffer(const char* data, int64_t size) {
  return parse_buffer(data, (size_t)size);
}

const char* newick_error(void* h) {
  auto* r = (ParseResult*)h;
  return r->error.empty() ? nullptr : r->error.c_str();
}

int64_t newick_n_trees(void* h) { return ((ParseResult*)h)->n_trees; }
int64_t newick_n_nodes(void* h) { return ((ParseResult*)h)->n_nodes; }

const double* newick_lengths(void* h) { return ((ParseResult*)h)->lengths.data(); }
const uint64_t* newick_struct_hashes(void* h) {
  return ((ParseResult*)h)->struct_hashes.data();
}
const int32_t* newick_parents(void* h) { return ((ParseResult*)h)->parents.data(); }
const char* newick_names(void* h) { return ((ParseResult*)h)->names_blob.c_str(); }

void newick_free(void* h) { delete (ParseResult*)h; }

}  // extern "C"
