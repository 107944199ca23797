// Native SMILES featurizer for the Madrigal-TPU host data pipeline.
//
// C++ port of madrigal_tpu/data/smiles.py + featurize.py: parses SMILES
// (organic subset, brackets, rings incl. %nn, branches, charges, aromatic
// atoms/bonds), computes implicit hydrogens / ring membership (bridge
// finding) / approximate hybridization, and emits the torchdrug-compatible
// 67-dim atom / 18-dim bond features consumed by the GIN encoder
// (reference featurization role: torchdrug/RDKit C++ -- SURVEY.md 2.1).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -shared -fPIC -o libmadrigal_native.so featurizer.cpp

#include <algorithm>
#include <array>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

constexpr int MOL_DIM = 67;
constexpr int BOND_DIM = 18;

struct Atom {
  std::string symbol;
  bool aromatic = false;
  int charge = 0;
  int explicit_h = -1;  // -1 = not specified
  int chiral = 0;
  bool in_ring = false;
  int n_h = 0;
  std::vector<int> bonds;
};

struct Bond {
  int a = 0, b = 0;
  int order = 1;
  bool aromatic = false;
  bool in_ring = false;
  bool conjugated = false;
  int direction = 0;
};

struct Molecule {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
};

const char* ATOM_VOCAB[] = {"H",  "B",  "C",  "N",  "O",  "F",  "Mg", "Si",
                            "P",  "S",  "Cl", "Cu", "Zn", "Se", "Br", "Sn",
                            "I"};
constexpr int ATOM_VOCAB_N = 17;

int atom_vocab_index(const std::string& s) {
  for (int i = 0; i < ATOM_VOCAB_N; ++i)
    if (s == ATOM_VOCAB[i]) return i;
  return -1;
}

bool default_valences(const std::string& s, std::vector<int>* out) {
  static const std::map<std::string, std::vector<int>> kV = {
      {"B", {3}}, {"C", {4}},       {"N", {3, 5}}, {"O", {2}},
      {"P", {3, 5}}, {"S", {2, 4, 6}}, {"F", {1}},    {"Cl", {1}},
      {"Br", {1}}, {"I", {1}},      {"H", {1}}};
  auto it = kV.find(s);
  if (it == kV.end()) return false;
  *out = it->second;
  return true;
}

bool is_organic_two(const std::string& s) { return s == "Cl" || s == "Br"; }

struct Parser {
  std::string s;  // by value: callers pass temporaries
  size_t i = 0;
  Molecule mol;
  std::vector<int> stack;
  int prev = -1;
  int pending_order = 0;
  int pending_dir = 0;
  std::map<std::string, std::array<int, 3>> ring_open;
  bool ok = true;

  explicit Parser(const std::string& str) : s(str) {}

  int add_atom(Atom a) {
    mol.atoms.push_back(std::move(a));
    return static_cast<int>(mol.atoms.size()) - 1;
  }

  void add_bond(int x, int y, int order, int dir) {
    Bond b;
    b.a = x;
    b.b = y;
    b.order = order > 0 ? order : 1;
    b.aromatic = mol.atoms[x].aromatic && mol.atoms[y].aromatic && order == 0;
    b.direction = dir;
    mol.bonds.push_back(b);
    int bi = static_cast<int>(mol.bonds.size()) - 1;
    mol.atoms[x].bonds.push_back(bi);
    mol.atoms[y].bonds.push_back(bi);
  }

  bool parse_bracket() {
    size_t j = s.find(']', i);
    if (j == std::string::npos) return false;
    std::string body = s.substr(i + 1, j - i - 1);
    size_t p = 0;
    // isotope
    while (p < body.size() && isdigit(body[p])) ++p;
    if (p >= body.size()) return false;
    // symbol
    std::string sym;
    if (isupper(body[p])) {
      sym += body[p++];
      if (p < body.size() && islower(body[p]) && body[p] != 'h') {
        // two-letter uppercase element (avoid eating H-count 'h'? SMILES
        // uses capital H for hydrogen count; lowercase after capital is
        // part of the element symbol)
        sym += body[p++];
      }
    } else if (islower(body[p])) {
      sym += body[p++];
      if (p < body.size() && islower(body[p]) && body[p] != 'h') {
        // 'se', 'as'
        std::string two = sym + body[p];
        if (two == "se" || two == "as") {
          sym = two;
          ++p;
        }
      }
    } else if (body[p] == '*') {
      sym = "*";
      ++p;
    } else {
      return false;
    }
    bool aromatic = islower(sym[0]) && sym != "*";
    std::string symbol = sym;
    if (aromatic) {
      symbol[0] = toupper(symbol[0]);
    }
    // chiral
    int chiral = 0;
    while (p < body.size() && body[p] == '@') {
      ++chiral;
      ++p;
    }
    // H count
    int explicit_h = 0;
    if (p < body.size() && body[p] == 'H') {
      ++p;
      explicit_h = 1;
      if (p < body.size() && isdigit(body[p])) {
        explicit_h = body[p] - '0';
        ++p;
      }
    }
    // charge
    int charge = 0;
    if (p < body.size() && (body[p] == '+' || body[p] == '-')) {
      char c = body[p];
      int cnt = 0;
      while (p < body.size() && body[p] == c) {
        ++cnt;
        ++p;
      }
      if (p < body.size() && isdigit(body[p])) {
        cnt = 0;
        while (p < body.size() && isdigit(body[p]))
          cnt = cnt * 10 + (body[p++] - '0');
      }
      charge = (c == '+') ? cnt : -cnt;
    }
    // atom map
    if (p < body.size() && body[p] == ':') {
      ++p;
      while (p < body.size() && isdigit(body[p])) ++p;
    }
    if (p != body.size()) return false;

    Atom a;
    a.symbol = symbol;
    a.aromatic = aromatic;
    a.charge = charge;
    a.explicit_h = explicit_h;
    a.chiral = chiral > 2 ? 2 : chiral;
    int idx = add_atom(a);
    if (prev >= 0) add_bond(prev, idx, pending_order, pending_dir);
    prev = idx;
    pending_order = 0;
    pending_dir = 0;
    i = j + 1;
    return true;
  }

  bool parse() {
    while (i < s.size() && ok) {
      char ch = s[i];
      if (ch == '(') {
        if (prev < 0) return false;
        stack.push_back(prev);
        ++i;
      } else if (ch == ')') {
        if (stack.empty()) return false;
        prev = stack.back();
        stack.pop_back();
        ++i;
      } else if (ch == '-' || ch == '=' || ch == '#' || ch == ':' ||
                 ch == '$') {
        pending_order = (ch == '-')   ? 1
                        : (ch == '=') ? 2
                        : (ch == '#') ? 3
                        : (ch == '$') ? 4
                                      : 0;
        ++i;
      } else if (ch == '/' || ch == '\\') {
        pending_dir = ch == '/' ? 1 : 2;
        pending_order = 1;
        ++i;
      } else if (ch == '.') {
        prev = -1;
        pending_order = 0;
        ++i;
      } else if (ch == '[') {
        if (!parse_bracket()) return false;
      } else if (isdigit(ch) || ch == '%') {
        std::string label;
        if (ch == '%') {
          if (i + 2 >= s.size()) return false;
          label = s.substr(i + 1, 2);
          i += 3;
        } else {
          label = std::string(1, ch);
          ++i;
        }
        if (prev < 0) return false;
        auto it = ring_open.find(label);
        if (it != ring_open.end()) {
          auto [other, order0, dir0] = it->second;
          ring_open.erase(it);
          int order = pending_order ? pending_order : order0;
          add_bond(prev, other, order, pending_dir ? pending_dir : dir0);
          mol.bonds.back().in_ring = true;
        } else {
          ring_open[label] = {prev, pending_order, pending_dir};
        }
        pending_order = 0;
        pending_dir = 0;
      } else {
        std::string symbol;
        bool aromatic = false;
        std::string two = s.substr(i, 2);
        if (is_organic_two(two)) {
          symbol = two;
          i += 2;
        } else if (strchr("BCNOPSFI", ch)) {
          symbol = std::string(1, ch);
          ++i;
        } else if (strchr("bcnops", ch)) {
          symbol = std::string(1, static_cast<char>(toupper(ch)));
          aromatic = true;
          ++i;
        } else {
          return false;
        }
        Atom a;
        a.symbol = symbol;
        a.aromatic = aromatic;
        int idx = add_atom(a);
        if (prev >= 0) add_bond(prev, idx, pending_order, pending_dir);
        prev = idx;
        pending_order = 0;
        pending_dir = 0;
      }
    }
    return ring_open.empty() && stack.empty() && !mol.atoms.empty();
  }
};

// Tarjan bridge finding (iterative); bonds not on bridges are ring bonds.
void mark_rings(Molecule* mol) {
  int n = static_cast<int>(mol->atoms.size());
  std::vector<std::vector<std::pair<int, int>>> adj(n);
  for (int bi = 0; bi < static_cast<int>(mol->bonds.size()); ++bi) {
    adj[mol->bonds[bi].a].push_back({mol->bonds[bi].b, bi});
    adj[mol->bonds[bi].b].push_back({mol->bonds[bi].a, bi});
  }
  std::vector<int> disc(n, 0), low(n, 0);
  std::vector<bool> visited(n, false);
  std::vector<bool> bridge(mol->bonds.size(), false);
  int timer = 1;

  struct Frame {
    int u, pb;
    size_t it;
  };
  for (int root = 0; root < n; ++root) {
    if (visited[root]) continue;
    std::vector<Frame> st{{root, -1, 0}};
    visited[root] = true;
    disc[root] = low[root] = timer++;
    while (!st.empty()) {
      Frame& f = st.back();
      bool advanced = false;
      while (f.it < adj[f.u].size()) {
        auto [v, bi] = adj[f.u][f.it++];
        if (bi == f.pb) continue;
        if (!visited[v]) {
          visited[v] = true;
          disc[v] = low[v] = timer++;
          st.push_back({v, bi, 0});
          advanced = true;
          break;
        } else {
          low[f.u] = std::min(low[f.u], disc[v]);
        }
      }
      if (!advanced) {
        int u = f.u, pb = f.pb;
        st.pop_back();
        if (!st.empty()) {
          int pu = st.back().u;
          low[pu] = std::min(low[pu], low[u]);
          if (low[u] > disc[pu]) bridge[pb] = true;
        }
      }
    }
  }
  for (size_t bi = 0; bi < mol->bonds.size(); ++bi) {
    Bond& b = mol->bonds[bi];
    b.in_ring = !bridge[bi];
    if (b.in_ring) {
      mol->atoms[b.a].in_ring = true;
      mol->atoms[b.b].in_ring = true;
    }
  }
}

void finalize(Molecule* mol) {
  mark_rings(mol);
  for (auto& a : mol->atoms) {
    if (a.explicit_h >= 0) {
      a.n_h = a.explicit_h;
      continue;
    }
    int bond_order = 0;
    if (a.aromatic) {
      int n_arom = 0;
      int other = 0;
      for (int bi : a.bonds) {
        if (mol->bonds[bi].aromatic)
          ++n_arom;
        else
          other += mol->bonds[bi].order;
      }
      bond_order = other + n_arom + (n_arom > 0 ? 1 : 0);
    } else {
      for (int bi : a.bonds) bond_order += mol->bonds[bi].order;
    }
    std::vector<int> valences;
    if (!default_valences(a.symbol, &valences)) valences = {bond_order};
    int eff = bond_order;
    if ((a.symbol == "N" || a.symbol == "P") && a.charge != 0)
      eff = bond_order - a.charge;
    if ((a.symbol == "O" || a.symbol == "S") && a.charge < 0)
      eff = bond_order - a.charge;
    int h = 0;
    for (int v : valences) {
      if (eff <= v) {
        h = v - eff;
        break;
      }
    }
    a.n_h = h > 0 ? h : 0;
  }
  std::vector<bool> multi(mol->atoms.size(), false);
  for (auto& b : mol->bonds) {
    if (b.order >= 2 || b.aromatic) {
      multi[b.a] = true;
      multi[b.b] = true;
    }
  }
  for (auto& b : mol->bonds)
    b.conjugated = b.aromatic || (multi[b.a] && multi[b.b]);
}

int hybridization_of(const Molecule& mol, const Atom& a) {
  if (a.aromatic) return 3;
  int n_double = 0, n_triple = 0;
  for (int bi : a.bonds) {
    if (mol.bonds[bi].order == 2) ++n_double;
    if (mol.bonds[bi].order == 3) ++n_triple;
  }
  int heavy = static_cast<int>(a.bonds.size());
  int total = heavy + a.n_h;
  if (n_triple || n_double >= 2) return 2;
  if (n_double == 1) return 3;
  if (total <= 1 && heavy == 0) return 1;
  if (total >= 6) return 6;
  if (total == 5) return 5;
  return 4;
}

void onehot(float* dst, int idx, int size, bool allow_unknown) {
  int width = size + (allow_unknown ? 1 : 0);
  for (int k = 0; k < width; ++k) dst[k] = 0.f;
  if (idx >= 0 && idx < size)
    dst[idx] = 1.f;
  else if (allow_unknown)
    dst[size] = 1.f;
}

void atom_features(const Molecule& mol, const Atom& a, float* out) {
  float* p = out;
  onehot(p, atom_vocab_index(a.symbol), ATOM_VOCAB_N, true);
  p += ATOM_VOCAB_N + 1;
  onehot(p, a.chiral, 4, false);
  p += 4;
  onehot(p, static_cast<int>(a.bonds.size()) + a.n_h, 7, true);
  p += 8;
  int cg = a.charge + 5;
  onehot(p, (cg >= 0 && cg <= 10) ? cg : -1, 11, false);
  p += 11;
  onehot(p, a.n_h, 7, true);
  p += 8;
  onehot(p, 0, 8, false);  // radicals: parser doesn't track; 0
  p += 8;
  onehot(p, hybridization_of(mol, a), 8, false);
  p += 8;
  p[0] = a.aromatic ? 1.f : 0.f;
  p[1] = a.in_ring ? 1.f : 0.f;
}

void bond_features(const Bond& b, float* out) {
  float* p = out;
  int type_idx = b.aromatic ? 3 : (b.order == 2 ? 1 : (b.order == 3 ? 2 : 0));
  onehot(p, type_idx, 4, false);
  p += 4;
  onehot(p, b.direction, 7, false);
  p += 7;
  onehot(p, 0, 6, false);  // stereo: not tracked
  p += 6;
  p[0] = b.conjugated ? 1.f : 0.f;
}

}  // namespace

extern "C" {

// Featurize one SMILES string.
// Outputs: node_feats [node_cap * 67], edge_index [edge_cap * 2] (both bond
// directions), edge_feats [edge_cap * 18]. Returns 0 on success, 1 on parse
// error, 2 if capacities are too small.
int mtpu_featurize(const char* smiles, float* node_feats, int32_t* n_atoms,
                   int32_t* edge_index, float* edge_feats, int32_t* n_edges,
                   int32_t node_cap, int32_t edge_cap) {
  Parser parser{std::string(smiles)};
  if (!parser.parse()) return 1;
  Molecule& mol = parser.mol;
  finalize(&mol);

  int na = static_cast<int>(mol.atoms.size());
  int ne = static_cast<int>(mol.bonds.size()) * 2;
  if (na > node_cap || ne > edge_cap) return 2;
  *n_atoms = na;
  *n_edges = ne;
  for (int ai = 0; ai < na; ++ai)
    atom_features(mol, mol.atoms[ai], node_feats + ai * MOL_DIM);
  for (size_t bi = 0; bi < mol.bonds.size(); ++bi) {
    const Bond& b = mol.bonds[bi];
    float feat[BOND_DIM];
    bond_features(b, feat);
    int e0 = static_cast<int>(bi) * 2;
    edge_index[e0 * 2 + 0] = b.a;
    edge_index[e0 * 2 + 1] = b.b;
    edge_index[(e0 + 1) * 2 + 0] = b.b;
    edge_index[(e0 + 1) * 2 + 1] = b.a;
    std::memcpy(edge_feats + e0 * BOND_DIM, feat, sizeof(feat));
    std::memcpy(edge_feats + (e0 + 1) * BOND_DIM, feat, sizeof(feat));
  }
  return 0;
}

// Bulk featurization: returns number successfully parsed; failures get
// n_atoms[i] = 0. Strides: smiles are NUL-separated in one buffer.
int mtpu_featurize_batch(const char* smiles_buf, const int32_t* offsets,
                         int32_t count, float* node_feats,
                         int32_t* n_atoms_arr, int32_t* edge_index,
                         float* edge_feats, int32_t* n_edges_arr,
                         int32_t node_cap_per_mol, int32_t edge_cap_per_mol) {
  int ok = 0;
  for (int32_t m = 0; m < count; ++m) {
    const char* smi = smiles_buf + offsets[m];
    int rc = mtpu_featurize(
        smi, node_feats + static_cast<int64_t>(m) * node_cap_per_mol * MOL_DIM,
        n_atoms_arr + m,
        edge_index + static_cast<int64_t>(m) * edge_cap_per_mol * 2,
        edge_feats + static_cast<int64_t>(m) * edge_cap_per_mol * BOND_DIM,
        n_edges_arr + m, node_cap_per_mol, edge_cap_per_mol);
    if (rc == 0) {
      ++ok;
    } else {
      n_atoms_arr[m] = 0;
      n_edges_arr[m] = 0;
    }
  }
  return ok;
}

}  // extern "C"

extern "C" {

// Featurize a SMILES batch and pack it directly into a padded node/edge
// arena (the molgraph.pack_molecules layout): node_feats [node_budget*67],
// node_mask/node_graph [node_budget], edge_src/dst [edge_budget],
// edge_feats [edge_budget*18], edge_mask [edge_budget].
// Unparseable molecules contribute a single zero-feature atom (so graph
// ids stay aligned with the input order). Returns 0 on success, 2 if the
// budgets overflow.
int mtpu_featurize_pack(const char* smiles_buf, const int32_t* offsets,
                        int32_t count, float* node_feats, uint8_t* node_mask,
                        int32_t* node_graph, int32_t* edge_src,
                        int32_t* edge_dst, float* edge_feats,
                        uint8_t* edge_mask, int32_t node_budget,
                        int32_t edge_budget, int32_t* n_nodes_out,
                        int32_t* n_edges_out) {
  std::memset(node_feats, 0, sizeof(float) * node_budget * MOL_DIM);
  std::memset(node_mask, 0, node_budget);
  std::memset(edge_feats, 0, sizeof(float) * edge_budget * BOND_DIM);
  std::memset(edge_mask, 0, edge_budget);
  for (int32_t i = 0; i < node_budget; ++i) node_graph[i] = count;
  for (int32_t i = 0; i < edge_budget; ++i) {
    edge_src[i] = 0;
    edge_dst[i] = 0;
  }

  int32_t n_off = 0;
  int32_t e_off = 0;
  for (int32_t m = 0; m < count; ++m) {
    Parser parser{std::string(smiles_buf + offsets[m])};
    Molecule mol;
    if (parser.parse()) {
      mol = std::move(parser.mol);
      finalize(&mol);
    } else {
      mol.atoms.push_back(Atom{});
      mol.atoms.back().symbol = "*";
    }
    int na = static_cast<int>(mol.atoms.size());
    int ne = static_cast<int>(mol.bonds.size()) * 2;
    if (n_off + na > node_budget || e_off + ne > edge_budget) return 2;
    for (int ai = 0; ai < na; ++ai) {
      atom_features(mol, mol.atoms[ai],
                    node_feats + (n_off + ai) * MOL_DIM);
      node_mask[n_off + ai] = 1;
      node_graph[n_off + ai] = m;
    }
    for (size_t bi = 0; bi < mol.bonds.size(); ++bi) {
      const Bond& b = mol.bonds[bi];
      float feat[BOND_DIM];
      bond_features(b, feat);
      int e0 = e_off + static_cast<int>(bi) * 2;
      edge_src[e0] = n_off + b.a;
      edge_dst[e0] = n_off + b.b;
      edge_src[e0 + 1] = n_off + b.b;
      edge_dst[e0 + 1] = n_off + b.a;
      std::memcpy(edge_feats + e0 * BOND_DIM, feat, sizeof(feat));
      std::memcpy(edge_feats + (e0 + 1) * BOND_DIM, feat, sizeof(feat));
      edge_mask[e0] = 1;
      edge_mask[e0 + 1] = 1;
    }
    n_off += na;
    e_off += ne;
  }
  *n_nodes_out = n_off;
  *n_edges_out = e_off;
  return 0;
}

}  // extern "C"
