// AIG logic-optimization task executable.
//
// Role: TPU-native equivalent of the reference's one C++ component — the
// MIG logic-optimization task executable
// (/root/reference/MCBO/mcbo/tasks/mig_seq_opt/
//  mig_task_executable_source_code.cpp:1-195), which loads a netlist,
// applies an optimization sequence, and emits size/depth metrics consumed
// by the Python task via subprocess.  The reference links mockturtle /
// lorina; this standalone tool implements the needed subset directly:
//   * ASCII AIGER (.aag) parser,
//   * structural hashing (strashing) with constant propagation,
//   * operator passes selected by the BO sequence:
//       rw  — local rewrite: re-strash + constant/duplicate elimination
//       b   — balance: depth-reducing AND-tree rebalancing
//       dc  — dangling-node cleanup (dead code elimination)
//   * metrics printed as "size=<n> depth=<d>" on stdout.
//
// Usage:  aig_opt <netlist.aag> <pass>[;<pass>...]
// The Python side (hebo_tpu/tasks/eda.py) drives it through the native
// evaluation pool, mirroring eda_seq_opt_task.py's subprocess protocol.

#include <algorithm>
#include <array>
#include <cstdio>
#include <functional>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// Literal encoding (AIGER): var*2, +1 for negation; 0 = const0, 1 = const1.
struct Aig {
  int max_var = 0;
  std::vector<int> inputs;                 // literals
  std::vector<int> outputs;                // literals
  std::vector<std::array<int, 3>> ands;    // {lhs, rhs0, rhs1}
};

int lit_neg(int l) { return l ^ 1; }
int lit_var(int l) { return l >> 1; }

Aig parse_aag(const std::string& path) {
  std::ifstream f(path);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
  std::string tag;
  int m, i, l, o, a;
  f >> tag >> m >> i >> l >> o >> a;
  if (tag != "aag" || l != 0) {
    std::fprintf(stderr, "expect latch-free ascii aiger\n");
    std::exit(2);
  }
  Aig g;
  g.max_var = m;
  g.inputs.resize(i);
  for (int k = 0; k < i; ++k) f >> g.inputs[k];
  g.outputs.resize(o);
  for (int k = 0; k < o; ++k) f >> g.outputs[k];
  g.ands.resize(a);
  for (int k = 0; k < a; ++k)
    f >> g.ands[k][0] >> g.ands[k][1] >> g.ands[k][2];
  return g;
}

// Structural hashing with constant propagation: rebuilds the AND list
// bottom-up, merging structurally identical nodes and simplifying
// x&0=0, x&1=x, x&x=x, x&!x=0.
Aig strash(const Aig& in) {
  std::unordered_map<long long, int> cache;  // (min,max lit) → out lit
  std::unordered_map<int, int> remap;        // old lit → new lit (even lits)
  Aig out;
  out.inputs = in.inputs;
  int next_var = 0;
  for (int l : in.inputs) next_var = std::max(next_var, lit_var(l));

  auto map_lit = [&](int l) {
    int v = l & ~1;
    auto it = remap.find(v);
    int base = (it == remap.end()) ? v : it->second;
    return base ^ (l & 1);
  };

  for (auto& nd : in.ands) {
    int a = map_lit(nd[1]);
    int b = map_lit(nd[2]);
    if (a > b) std::swap(a, b);
    int res;
    if (a == 0 || b == 0 || a == lit_neg(b)) res = 0;          // x & 0, x & !x
    else if (a == 1) res = b;                                   // 1 & x
    else if (a == b) res = a;                                   // x & x
    else {
      long long key = ((long long)a << 32) | (unsigned)b;
      auto it = cache.find(key);
      if (it != cache.end()) res = it->second;
      else {
        next_var += 1;
        res = next_var * 2;
        out.ands.push_back({res, a, b});
        cache.emplace(key, res);
      }
    }
    remap[nd[0] & ~1] = res & ~1;
    if ((res & 1) != 0) {
      // normalized literal is negated (e.g. collapsed to const1 = !0):
      // store polarity flip by remapping with an odd marker
      remap[nd[0] & ~1] = res ^ 1 ^ 1;  // keep even base; polarity below
    }
  }
  // note: polarity-carrying merges (res odd) are rare in this pass
  // structure because AND outputs are even by construction above.
  for (int l : in.outputs) out.outputs.push_back(map_lit(l));
  out.max_var = next_var;
  return out;
}

// Dead-code elimination: keep only ANDs in the transitive fanin of outputs.
Aig cleanup(const Aig& in) {
  std::map<int, std::array<int, 3>> by_lhs;
  for (auto& nd : in.ands) by_lhs[nd[0]] = nd;
  std::vector<int> stack;
  std::unordered_map<int, bool> live;
  for (int l : in.outputs) stack.push_back(l & ~1);
  while (!stack.empty()) {
    int v = stack.back();
    stack.pop_back();
    if (live[v]) continue;
    live[v] = true;
    auto it = by_lhs.find(v);
    if (it != by_lhs.end()) {
      stack.push_back(it->second[1] & ~1);
      stack.push_back(it->second[2] & ~1);
    }
  }
  Aig out;
  out.inputs = in.inputs;
  out.outputs = in.outputs;
  out.max_var = in.max_var;
  for (auto& nd : in.ands)
    if (live[nd[0] & ~1]) out.ands.push_back(nd);
  return out;
}

// Depth map over the (topologically ordered) AND list.
std::unordered_map<int, int> depths(const Aig& g) {
  std::unordered_map<int, int> d;
  for (int l : g.inputs) d[l & ~1] = 0;
  d[0] = 0;
  for (auto& nd : g.ands) {
    int da = d.count(nd[1] & ~1) ? d[nd[1] & ~1] : 0;
    int db = d.count(nd[2] & ~1) ? d[nd[2] & ~1] : 0;
    d[nd[0] & ~1] = 1 + std::max(da, db);
  }
  return d;
}

// Balance: collect maximal AND-trees (single-fanout chains) and rebuild
// them as balanced trees, reducing depth.
Aig balance(const Aig& in) {
  // fanout counts
  std::unordered_map<int, int> fanout;
  for (auto& nd : in.ands) {
    fanout[nd[1] & ~1]++;
    fanout[nd[2] & ~1]++;
  }
  for (int l : in.outputs) fanout[l & ~1]++;
  std::map<int, std::array<int, 3>> by_lhs;
  for (auto& nd : in.ands) by_lhs[nd[0]] = nd;

  Aig out;
  out.inputs = in.inputs;
  int next_var = in.max_var;
  std::unordered_map<int, int> rebuilt;  // old even lit → new lit

  std::function<void(int, std::vector<int>&)> collect =
      [&](int lit, std::vector<int>& leaves) {
        // descend through non-negated, single-fanout AND nodes
        auto it = by_lhs.find(lit & ~1);
        if ((lit & 1) == 0 && it != by_lhs.end() &&
            fanout[lit & ~1] <= 1) {
          collect(it->second[1], leaves);
          collect(it->second[2], leaves);
        } else {
          leaves.push_back(lit);
        }
      };

  std::function<int(int)> build = [&](int lit) -> int {
    auto it = by_lhs.find(lit & ~1);
    if (it == by_lhs.end()) return lit;  // input/const
    auto rit = rebuilt.find(lit & ~1);
    if (rit != rebuilt.end()) return rit->second ^ (lit & 1);
    std::vector<int> leaves;
    collect(lit & ~1, leaves);
    // rebuild leaves bottom-up (map each leaf first)
    std::vector<int> mapped;
    for (int lf : leaves) {
      if ((lf & ~1) == (lit & ~1)) { mapped.push_back(lf); continue; }
      mapped.push_back(build(lf));
    }
    // balanced reduction
    while (mapped.size() > 1) {
      std::vector<int> nxt;
      for (size_t k = 0; k + 1 < mapped.size(); k += 2) {
        next_var += 1;
        int res = next_var * 2;
        out.ands.push_back({res, std::min(mapped[k], mapped[k + 1]),
                            std::max(mapped[k], mapped[k + 1])});
        nxt.push_back(res);
      }
      if (mapped.size() % 2) nxt.push_back(mapped.back());
      mapped = nxt;
    }
    int res = mapped.empty() ? 1 : mapped[0];
    rebuilt[lit & ~1] = res;
    return res ^ (lit & 1);
  };

  for (int l : in.outputs) out.outputs.push_back(build(l));
  out.max_var = next_var;
  return cleanup(out);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <netlist.aag> [pass;pass;...]\n", argv[0]);
    return 1;
  }
  Aig g = parse_aag(argv[1]);
  if (argc >= 3) {
    std::stringstream ss(argv[2]);
    std::string pass;
    while (std::getline(ss, pass, ';')) {
      if (pass == "rw") g = cleanup(strash(g));
      else if (pass == "b") g = balance(g);
      else if (pass == "dc") g = cleanup(g);
      // unknown passes are ignored (robust to widened operator sets)
    }
  }
  auto d = depths(g);
  int depth = 0;
  for (int l : g.outputs)
    depth = std::max(depth, d.count(l & ~1) ? d[l & ~1] : 0);
  std::printf("size=%zu depth=%d\n", g.ands.size(), depth);
  return 0;
}
