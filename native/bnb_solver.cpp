// Exact branch-and-bound for the BFB fitting program.
//
// Solves  min  sum_res hinge(H_r x, [lb_r, ub_r])   (residual rows)
//         s.t. hard rows satisfied, x integer in [0, x_ub]
// replacing the reference's external cbc process (localhap.cpp:179)
// with an in-process native solver. DFS with:
//  - interval-arithmetic lower bounds: for a partial assignment the
//    free suffix of each row spans [lo, hi] (suffix sums of signed
//    column contributions), so hinge(g + [lo,hi], [lb,ub]) lower-bounds
//    the row's final hinge, and a hard row whose reachable interval
//    misses [lb,ub] prunes the node;
//  - value ordering around a warm-start incumbent (the device search
//    solution), giving strong early pruning;
//  - a node budget: on exhaustion the best-so-far is returned with
//    optimal=false so callers can fall back.
//
// C ABI for ctypes. All arithmetic in double; objectives are
// half-integers so exact comparisons use a 1e-6 slack.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Problem {
    int n_rows;      // total rows (residual first, then hard)
    int n_res;       // residual rows
    int V;           // variables
    const double *H;     // [n_rows * V]
    const double *Hc;    // [V * n_rows] column-major copy (cache-friendly assign)
    const double *lb;    // [n_rows]
    const double *ub;    // [n_rows]
    const int *x_ub;     // [V]
    const int *order;    // [V] variable processing order (permutation)
    long long node_cap;
    double time_limit_s;  // <= 0: no wall-clock limit
};

struct State {
    const Problem &p;
    std::vector<double> g;           // fixed contribution per row
    std::vector<std::vector<double>> suf_lo;  // [V+1][n_rows]
    std::vector<std::vector<double>> suf_hi;
    std::vector<int> x;              // assignment in ORDER space -> var id
    std::vector<int> best_x;
    double best_eps;
    long long nodes;
    bool aborted;
    std::chrono::steady_clock::time_point deadline;
    bool has_deadline;

    State(const Problem &prob) : p(prob) {
        has_deadline = p.time_limit_s > 0.0;
        if (has_deadline)
            deadline = std::chrono::steady_clock::now() +
                       std::chrono::duration_cast<std::chrono::steady_clock::duration>(
                           std::chrono::duration<double>(p.time_limit_s));
        g.assign(p.n_rows, 0.0);
        x.assign(p.V, 0);
        best_x.assign(p.V, 0);
        best_eps = 1e300;
        nodes = 0;
        aborted = false;
        // suffix ranges over the free variables in processing order
        suf_lo.assign(p.V + 1, std::vector<double>(p.n_rows, 0.0));
        suf_hi.assign(p.V + 1, std::vector<double>(p.n_rows, 0.0));
        for (int d = p.V - 1; d >= 0; d--) {
            int v = p.order[d];
            for (int r = 0; r < p.n_rows; r++) {
                double c = p.H[(size_t)r * p.V + v] * p.x_ub[v];
                suf_lo[d][r] = suf_lo[d + 1][r] + std::min(0.0, c);
                suf_hi[d][r] = suf_hi[d + 1][r] + std::max(0.0, c);
            }
        }
    }

    // lower bound on final objective for the node at depth d; returns
    // >= 1e290 when a hard row is unreachable
    double bound(int d) const {
        double res = 0.0;
        const std::vector<double> &lo = suf_lo[d];
        const std::vector<double> &hi = suf_hi[d];
        for (int r = 0; r < p.n_rows; r++) {
            double reach_lo = g[r] + lo[r];
            double reach_hi = g[r] + hi[r];
            double miss = 0.0;
            if (reach_hi < p.lb[r]) miss = p.lb[r] - reach_hi;
            if (reach_lo > p.ub[r]) miss = std::max(miss, reach_lo - p.ub[r]);
            if (r < p.n_res) {
                res += miss;
            } else if (miss > 1e-9) {
                return 1e290;  // hard row unreachable
            }
            if (res >= best_eps - 1e-6) return res;
        }
        return res;
    }

    void assign(int v, int val, int sign) {
        if (val == 0) return;
        const double *col = &p.Hc[(size_t)v * p.n_rows];
        const double sv = sign * (double)val;
        for (int r = 0; r < p.n_rows; r++) g[r] += sv * col[r];
    }

    void dfs(int d, const int *warm) {
        if (aborted) return;
        if (++nodes > p.node_cap) {
            aborted = true;
            return;
        }
        if (has_deadline && (nodes & 0x1fff) == 0 &&
            std::chrono::steady_clock::now() > deadline) {
            aborted = true;
            return;
        }
        double b = bound(d);
        if (b >= best_eps - 1e-6) return;
        if (d == p.V) {
            // complete assignment: bound(V) is the exact objective
            best_eps = b;
            for (int i = 0; i < p.V; i++) best_x[i] = x[i];
            return;
        }
        int v = p.order[d];
        int ub = p.x_ub[v];
        // value order: warm value first, then neighbors outward
        int w = warm ? std::min(warm[v], ub) : 0;
        for (int delta = 0; delta <= ub; delta++) {
            bool tried = false;
            for (int s = 0; s < 2; s++) {
                int val = (s == 0) ? w + delta : w - delta;
                if (delta == 0 && s == 1) continue;
                if (val < 0 || val > ub) continue;
                tried = true;
                x[v] = val;
                assign(v, val, +1);
                dfs(d + 1, warm);
                assign(v, val, -1);
                x[v] = 0;
                if (aborted) return;
            }
            (void)tried;
        }
    }
};

}  // namespace

extern "C" {

// Returns 1 if proven optimal, 0 if the node or wall-clock budget was
// hit (best-so-far in out_x / *out_eps), -1 on bad input.
// time_limit_s <= 0 disables the wall-clock limit.
int bfb_bnb(int n_rows, int n_res, int V, const double *H, const double *lb,
            const double *ub, const int *x_ub, const int *order,
            const int *warm_x, double warm_eps, long long node_cap,
            double time_limit_s, int *out_x, double *out_eps,
            long long *out_nodes) {
    if (n_rows <= 0 || V <= 0 || n_res < 0 || n_res > n_rows) return -1;
    std::vector<double> Hc((size_t)V * n_rows);
    for (int r = 0; r < n_rows; r++)
        for (int v = 0; v < V; v++) Hc[(size_t)v * n_rows + r] = H[(size_t)r * V + v];
    Problem p{n_rows, n_res, V, H, Hc.data(), lb, ub, x_ub, order, node_cap, time_limit_s};
    State st(p);
    if (warm_x && warm_eps < 1e290) {
        // validate the warm start as the initial incumbent
        std::vector<double> g(n_rows, 0.0);
        for (int v = 0; v < V; v++)
            for (int r = 0; r < n_rows; r++)
                g[r] += warm_x[v] * H[(size_t)r * V + v];
        double eps = 0.0;
        bool feasible = true;
        for (int r = 0; r < n_rows; r++) {
            double miss = 0.0;
            if (g[r] < lb[r]) miss = lb[r] - g[r];
            if (g[r] > ub[r]) miss = std::max(miss, g[r] - ub[r]);
            if (r < n_res)
                eps += miss;
            else if (miss > 1e-9)
                feasible = false;
        }
        if (feasible) {
            st.best_eps = eps + 1e-9;
            for (int v = 0; v < V; v++) st.best_x[v] = warm_x[v];
        }
    }
    st.dfs(0, warm_x);
    for (int v = 0; v < V; v++) out_x[v] = st.best_x[v];
    *out_eps = (st.best_eps > 1e290) ? -1.0 : st.best_eps;
    *out_nodes = st.nodes;
    return st.aborted ? 0 : 1;
}
}
