/*
 * Round-trip test of the C binding (exercise pattern of the reference's
 * graph_tests/c_binding_test.c: build graphs, take derivatives, register
 * workflow items, compile, run, copy back).
 */

#include <assert.h>
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "graph_c_binding.h"

static void test_double(void) {
    struct graph_c_context *c = graph_construct_context(DOUBLE, false);

    /* y = x^2 + 3x; dy/dx = 2x + 3 */
    graph_node x = graph_variable(c, 4, "x");
    double xv[4] = {1.0, 2.0, 3.0, 4.0};
    graph_set_variable(c, x, xv);

    graph_node three = graph_constant(c, 3.0);
    graph_node y = graph_add(c, graph_mul(c, x, x), graph_mul(c, three, x));
    graph_node dy = graph_df(c, y, x);

    /* workflow: y and dy as outputs, x <- x + 1 setter */
    graph_node one = graph_constant(c, 1.0);
    graph_node x_next = graph_add(c, x, one);
    graph_node inputs[1] = {x};
    graph_node outputs[2] = {y, dy};
    graph_node map_in[1] = {x_next};
    graph_node map_out[1] = {x};
    graph_add_item(c, inputs, 1, outputs, 2, map_in, map_out, 1, NULL,
                   "test_kernel", 4);
    graph_compile(c);
    graph_run(c);

    double out[4];
    graph_copy_to_host(c, x, out);
    for (int i = 0; i < 4; i++) {
        assert(fabs(out[i] - (xv[i] + 1.0)) < 1e-12);
    }

    /* dy evaluated at the updated x: 2x + 3 */
    graph_copy_to_host(c, dy, out);
    for (int i = 0; i < 4; i++) {
        assert(fabs(out[i] - (2.0 * (xv[i] + 1.0) + 3.0)) < 1e-12);
    }

    graph_destroy_context(c);
    printf("c_binding double: ok\n");
}

static void test_newton_via_converge(void) {
    /* solve x^2 = 2 with a converge item (reference solver::newton) */
    struct graph_c_context *c = graph_construct_context(DOUBLE, false);
    graph_node x = graph_variable(c, 2, "x");
    double xv[2] = {3.0, 0.5};
    graph_set_variable(c, x, xv);

    graph_node two = graph_constant(c, 2.0);
    graph_node f = graph_sub(c, graph_mul(c, x, x), two);
    graph_node fp = graph_df(c, f, x);
    graph_node x_next = graph_sub(c, x, graph_div(c, f, fp));
    graph_node f2 = graph_mul(c, f, f);

    graph_node inputs[1] = {x};
    graph_node outputs[1] = {f2};
    graph_node map_in[1] = {x_next};
    graph_node map_out[1] = {x};
    graph_add_converge_item(c, inputs, 1, outputs, 1, map_in, map_out, 1,
                            NULL, "newton", 2, 1e-28, 100);
    graph_compile(c);
    graph_run(c);

    double out[2];
    graph_copy_to_host(c, x, out);
    for (int i = 0; i < 2; i++) {
        assert(fabs(out[i] - sqrt(2.0)) < 1e-10);
    }
    graph_destroy_context(c);
    printf("c_binding newton: ok\n");
}

static void test_complex(void) {
    struct graph_c_context *c = graph_construct_context(COMPLEX_DOUBLE,
                                                        true);
    graph_node z = graph_variable(c, 1, "z");
    double zv[2] = {0.5, 0.25};   /* 0.5 + 0.25i */
    graph_set_variable(c, z, zv);
    graph_node e = graph_erfi(c, z);

    double out[2];
    graph_copy_to_host(c, e, out);
    /* scipy.special.erfi(0.5+0.25j) = 0.571286622... + 0.351186659...j */
    assert(fabs(out[0] - 0.5712866223943341) < 1e-10);
    assert(fabs(out[1] - 0.3511866593813804) < 1e-10);
    graph_destroy_context(c);
    printf("c_binding complex erfi: ok\n");
}

int main(void) {
    test_double();
    test_newton_via_converge();
    test_complex();
    printf("All C binding tests passed.\n");
    return 0;
}
