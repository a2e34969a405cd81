// Native BFB path-replay engine.
//
// The host-side hot loop of the engine: enumerate topological orders of
// the BFB DAG and replay each into a breakpoint path until one succeeds
// (reference equivalents: allTopologicalOrders LGM.cpp:3380-3409,
// getBFB :3514-3697, imperfectFBI :3431-3512). Unlike the reference,
// orders are enumerated LAZILY and replayed incrementally — the
// factorial order list is never materialized, so wide DAGs cost only
// as many replays as it takes to find a valid one.
//
// Pure integer logic: a vertex is (segment id, dir) with dir +1/-1.
// Exposed with a C ABI for ctypes. Semantics mirror
// ambigram_tpu/engine/{dag,path}.py exactly (differentially tested).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V {
    int id;
    int dir;  // +1 / -1
    bool operator==(const V &o) const { return id == o.id && dir == o.dir; }
    bool operator!=(const V &o) const { return !(*this == o); }
};

struct Inversion {
    int src;  // junction source segment id
    int tgt;  // junction target segment id
};

struct Ctx {
    int n_nodes;
    const int *adj_off;
    const int *adj_flat;
    const int *node_pat;   // [n,3] i,j,cn ; i<0 when empty
    const int *node_loop;  // [n,3]
    // inversions: sorted key array + parallel (src,tgt)
    int n_inv;
    const int *inv_key;
    const Inversion *inv;
    bool is_reversed;
    long long max_replays;
    long long replays_done;
    // work budget: replay cost is NOT uniform per order — a loop's
    // splice writes 4*cn entries and shifts the tail of the breakpoint
    // vector, so a solution with large copy numbers makes each replay
    // arbitrarily expensive (observed: one budgeted-by-count pass burnt
    // 10+ CPU-minutes on a noisy heuristic incumbent). work_done
    // accumulates shifted+written entries; the budget bounds actual
    // time, the replay count alone does not.
    long long max_work;
    long long work_done;
    long long path_cap;  // abort an order whose path exceeds the out buffer
};

const Inversion *find_inv(const Ctx &c, int seg) {
    int lo = 0, hi = c.n_inv - 1;
    while (lo <= hi) {
        int mid = (lo + hi) / 2;
        if (c.inv_key[mid] == seg) return &c.inv[mid];
        if (c.inv_key[mid] < seg)
            lo = mid + 1;
        else
            hi = mid - 1;
    }
    return nullptr;
}

V comp(const V &v) { return V{v.id, -v.dir}; }

// --------------------------------------------------------- imperfect FBI

void imperfect_fbi(const Ctx &c, std::vector<V> &p) {
    size_t pos = 0;
    while (pos < p.size()) {
        size_t n = p.size();
        V target = comp(p[pos]);
        size_t r = n;
        if (pos + 3 <= n) {
            for (size_t k = pos + 3; k < n; k++) {
                if (p[k] == target) {
                    r = k;
                    break;
                }
            }
        }
        size_t l = r - 1;
        bool mismatch = (r == n) || (pos + 1 < n && p[l] != comp(p[pos + 1]));
        if (mismatch) {
            if (pos + 1 < n) {
                int seg = p[pos + 1].id;
                const Inversion *iv = find_inv(c, seg);
                if (iv) {
                    if (p[pos + 1].dir > 0) {
                        p[pos + 1] = V{iv->src < iv->tgt ? iv->src : iv->tgt, +1};
                    } else {
                        p[pos + 1] = V{iv->src < iv->tgt ? iv->tgt : iv->src, -1};
                    }
                }
            }
            if (pos > 0) {
                int seg = p[pos].id;
                const Inversion *iv = find_inv(c, seg);
                if (iv && p[pos - 1].id == seg) {
                    int other = (iv->src == seg) ? iv->tgt : iv->src;
                    p[pos] = V{other, p[pos].dir};
                }
            }
            if (pos + 1 < n) {
                if (p[pos].dir > 0 && p[pos].id > p[pos + 1].id) p[pos + 1] = p[pos];
                if (p[pos].dir < 0 && p[pos].id < p[pos + 1].id) p[pos + 1] = p[pos];
            }
            pos += 2;
        } else {
            long long p1 = (long long)pos + ((long long)l - (long long)pos) / 2;
            long long p2 = p1 + 1;
            while (p1 >= (long long)pos - 1 && p1 > 0) {
                int seg = p[p1].id;
                const Inversion *iv = find_inv(c, seg);
                if (iv) {
                    int lo_id = iv->src < iv->tgt ? iv->src : iv->tgt;
                    int hi_id = iv->src < iv->tgt ? iv->tgt : iv->src;
                    if (p[p1].dir > 0) {
                        p[p1] = V{lo_id, +1};
                        if (p1 + 1 < (long long)p.size()) p[p1 + 1] = V{hi_id, -1};
                    } else {
                        p[p1] = V{hi_id, -1};
                        if (p1 + 1 < (long long)p.size()) p[p1 + 1] = V{lo_id, +1};
                    }
                    if (p2 != p1 + 1) {
                        if (p1 > (long long)pos - 1 && p2 < (long long)p.size())
                            p[p2] = comp(p[p1]);
                        if (p2 - 1 < (long long)p.size() && p1 + 1 < (long long)p.size())
                            p[p2 - 1] = comp(p[p1 + 1]);
                    }
                }
                p1 -= 2;
                p2 += 2;
            }
            pos = r + 1;
        }
    }
}

// -------------------------------------------------------------- replay

// replay one order; returns true on success with bkp filled
bool replay_order(Ctx &c, const std::vector<int> &order, bool forward,
                  std::vector<V> &bkp) {
    bkp.clear();
    int first = order[0];
    const int *pat0 = &c.node_pat[3 * first];
    const int *loop0 = &c.node_loop[3 * first];
    bool first_is_pat = pat0[0] >= 0;
    int start = first_is_pat ? pat0[0] : loop0[0];
    int end = first_is_pat ? pat0[1] : loop0[1];
    if (forward) {
        if (first_is_pat) {
            bkp.push_back(V{start, +1});
            bkp.push_back(V{end, +1});
        } else {
            for (int k = 0; k < loop0[2]; k++) {
                bkp.push_back(V{start, +1});
                bkp.push_back(V{end, +1});
                bkp.push_back(V{end, -1});
                bkp.push_back(V{start, -1});
            }
        }
    } else {
        if (first_is_pat) {
            bkp.push_back(V{end, -1});
            bkp.push_back(V{start, -1});
        } else {
            for (int k = 0; k < loop0[2]; k++) {
                bkp.push_back(V{end, -1});
                bkp.push_back(V{start, -1});
                bkp.push_back(V{start, +1});
                bkp.push_back(V{end, +1});
            }
        }
    }
    size_t i = 1;
    for (; i < order.size(); i++) {
        int node = order[i];
        const int *pat = &c.node_pat[3 * node];
        const int *loop = &c.node_loop[3 * node];
        if (pat[0] >= 0) {
            int s = pat[0], e = pat[1];
            V last = bkp.back();
            if (last.id == s && last.dir < 0) {
                bkp.push_back(V{s, +1});
                bkp.push_back(V{e, +1});
            } else if (last.id == e && last.dir > 0) {
                bkp.push_back(V{e, -1});
                bkp.push_back(V{s, -1});
            } else {
                break;
            }
        } else if (loop[0] >= 0) {
            int s = loop[0], e = loop[1], cn = loop[2];
            V v1{s, -1}, v2{e, +1};
            long long N = (long long)bkp.size();
            long long k = -1;
            bool use_v1 = false;
            // search v1 from the back with parity/monotonicity rules
            for (long long t = N - 1; t >= 0; t--) {
                if (bkp[t] == v1) {
                    bool reject = (t % 2 == 0) ||
                                  (t < N - 2 && bkp[t - 1].id < bkp[t + 2].id);
                    if (!reject) {
                        k = t;
                        use_v1 = true;
                        break;
                    }
                }
            }
            if (k < 0) {
                for (long long t = N - 1; t >= 0; t--) {
                    if (bkp[t] == v2) {
                        bool reject = (t % 2 == 0) ||
                                      (t < N - 2 && bkp[t - 1].id > bkp[t + 2].id);
                        if (!reject) {
                            k = t;
                            break;
                        }
                    }
                }
            }
            if (k < 0) break;
            std::vector<V> piece;
            piece.reserve(4 * cn);
            if (use_v1) {
                for (int q = 0; q < cn; q++) {
                    piece.push_back(V{s, +1});
                    piece.push_back(V{e, +1});
                    piece.push_back(V{e, -1});
                    piece.push_back(V{s, -1});
                }
                bkp[k] = V{s, -1};
                if (k + 1 < (long long)bkp.size()) bkp[k + 1] = V{s, +1};
            } else {
                for (int q = 0; q < cn; q++) {
                    piece.push_back(V{e, -1});
                    piece.push_back(V{s, -1});
                    piece.push_back(V{s, +1});
                    piece.push_back(V{e, +1});
                }
                bkp[k] = V{e, +1};
                if (k + 1 < (long long)bkp.size()) bkp[k + 1] = V{e, -1};
            }
            // charge the real cost of the splice (piece write + tail
            // shift) and abort orders whose path outgrows the output
            // buffer — they could never be emitted anyway
            c.work_done += (long long)piece.size() +
                           ((long long)bkp.size() - (k + 1));
            if ((long long)(bkp.size() + piece.size()) > c.path_cap)
                return false;
            bkp.insert(bkp.begin() + k + 1, piece.begin(), piece.end());
        }
    }
    c.work_done += (long long)bkp.size() + (long long)order.size();
    if (i != order.size()) return false;  // failed order: bkp is discarded
    imperfect_fbi(c, bkp);
    return true;
}

// ----------------------------------------------- lazy order enumeration

struct Enumerator {
    const Ctx &c;
    std::vector<int> indeg;
    std::vector<bool> visited;
    std::vector<int> res;
    std::vector<V> bkp;
    bool forward;
    bool done;
    std::vector<V> out;

    Enumerator(const Ctx &ctx) : c(ctx), done(false) {
        indeg.assign(c.n_nodes, 0);
        visited.assign(c.n_nodes, false);
        for (int i = 0; i < c.n_nodes; i++)
            for (int e = c.adj_off[i]; e < c.adj_off[i + 1]; e++)
                indeg[c.adj_flat[e]]++;
        forward = !c.is_reversed;
    }

    // returns true when a complete replay succeeded (stored in out)
    bool rec(Ctx &ctx) {
        // charge enumeration work per visited partial order so graphs
        // that are expensive to scan (huge dead-end subtrees) stay
        // inside the budget even when no order ever completes
        ctx.work_done++;
        if (ctx.max_work > 0 && ctx.work_done >= ctx.max_work) {
            done = true;
            return false;
        }
        if ((int)res.size() == c.n_nodes) {
            ctx.replays_done++;
            if (replay_order(ctx, res, forward, bkp)) {
                out = bkp;
                return true;
            }
            if ((ctx.max_replays > 0 && ctx.replays_done >= ctx.max_replays) ||
                (ctx.max_work > 0 && ctx.work_done >= ctx.max_work))
                done = true;
            return false;
        }
        for (int i = 0; i < c.n_nodes && !done; i++) {
            if (indeg[i] == 0 && !visited[i]) {
                for (int e = c.adj_off[i]; e < c.adj_off[i + 1]; e++)
                    indeg[c.adj_flat[e]]--;
                res.push_back(i);
                visited[i] = true;
                bool found = rec(ctx);
                visited[i] = false;
                res.pop_back();
                for (int e = c.adj_off[i]; e < c.adj_off[i + 1]; e++)
                    indeg[c.adj_flat[e]]++;
                if (found) return true;
            }
        }
        return false;
    }
};

}  // namespace

extern "C" {

// Returns the expanded path length (in (id,dir) steps) written to
// out_path (pairs: id, dir(+1/-1)), or 0 if no order succeeded, or -1
// on capacity error. max_replays==0 means unbounded. out_exhausted
// (may be null) is set to 1 when a replay/work budget ran out before
// any order succeeded — the caller can then distinguish a bounded
// "no path" from a proven one (the reference is always unbounded,
// LGM.cpp:3380-3409).
int bfb_replay(int n_nodes, const int *adj_off, const int *adj_flat,
               const int *node_pat, const int *node_loop, int n_inv,
               const int *inv_key, const int *inv_src, const int *inv_tgt,
               int is_reversed, long long max_replays, int *out_path,
               int out_cap, int *out_exhausted) {
    if (out_exhausted) *out_exhausted = 0;
    if (n_nodes <= 0) return 0;
    std::vector<Inversion> invs(n_inv);
    for (int k = 0; k < n_inv; k++) invs[k] = Inversion{inv_src[k], inv_tgt[k]};
    // work budget: ~64 vector entries of splice traffic per budgeted
    // replay on a typical path; bounds wall time even when individual
    // replays are huge (large-CN incumbents)
    long long max_work = max_replays > 0 ? max_replays * 64 : 0;
    // In-replay abort bound: emission writes 2 ints per expanded step,
    // and expanded steps >= breakpoint pairs = bkp.size()/2, so the
    // emitted ints are >= bkp.size() — a breakpoint vector larger than
    // out_cap can NEVER be emitted into this buffer and is aborted
    // during replay. The bound must not be tighter: a path with bkp in
    // (out_cap/2, out_cap] can still emit when its runs are short
    // (ints = 2*steps can be <= out_cap), so halving the threshold
    // would silently drop real paths — those middle cases instead
    // finish replay, fail emission with -1, and succeed on the 16x
    // capacity retry.
    Ctx c{n_nodes, adj_off,  adj_flat,   node_pat,
          node_loop, n_inv,  inv_key,    invs.data(),
          is_reversed != 0,  max_replays, 0,
          max_work, 0, (long long)out_cap};

    // Kahn's check: the "DAG" construction inherits the reference's
    // shared-parent edge rule (LGM.cpp:3353-3361), which is NOT
    // span-monotone and can emit a cyclic graph on some solved CN
    // vectors (observed on a noisy S=32 heuristic incumbent). A cyclic
    // graph has ZERO topological orders, so the enumeration provably
    // finds nothing — the reference would discover that only after a
    // factorial dead-end scan; answering "no path" immediately is the
    // same result without the hang.
    {
        std::vector<int> indeg(n_nodes, 0), q;
        for (int i = 0; i < n_nodes; i++)
            for (int e = adj_off[i]; e < adj_off[i + 1]; e++) indeg[adj_flat[e]]++;
        for (int i = 0; i < n_nodes; i++)
            if (indeg[i] == 0) q.push_back(i);
        int seen = 0;
        for (size_t h = 0; h < q.size(); h++) {
            int u = q[h];
            seen++;
            for (int e = adj_off[u]; e < adj_off[u + 1]; e++)
                if (--indeg[adj_flat[e]] == 0) q.push_back(adj_flat[e]);
        }
        if (seen != n_nodes) return 0;
    }

    Enumerator en(c);
    bool found = en.rec(c);
    bool fwd_exhausted = en.done;
    if (!found) {
        // retry in the reverse orientation (LGM.cpp:3691-3695), with a
        // fresh replay budget: a budget-exhausted forward pass must not
        // silently skip the reverse pass (the reverse orientation often
        // succeeds immediately when the forward one cannot at all)
        c.replays_done = 0;
        c.work_done = 0;
        en.done = false;
        en.forward = c.is_reversed;
        found = en.rec(c);
    }
    if (!found) {
        // a budget fired (replay count or work) in EITHER pass — the
        // enumeration did NOT prove every order fails
        if (out_exhausted && (en.done || fwd_exhausted)) *out_exhausted = 1;
        return 0;
    }

    // expand breakpoint pairs to per-segment runs (LGM.cpp:3658-3690)
    std::vector<int> steps;
    for (size_t j = 1; j < en.out.size(); j += 2) {
        V a = en.out[j - 1], b = en.out[j];
        if (a.dir > 0) {
            for (int k = a.id; k <= b.id; k++) {
                steps.push_back(k);
                steps.push_back(+1);
            }
        } else {
            for (int k = a.id; k >= b.id; k--) {
                steps.push_back(k);
                steps.push_back(-1);
            }
        }
    }
    int n_steps = (int)steps.size() / 2;
    if (n_steps * 2 > out_cap) return -1;
    std::memcpy(out_path, steps.data(), steps.size() * sizeof(int));
    return n_steps;
}
}
