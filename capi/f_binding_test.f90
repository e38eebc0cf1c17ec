!------------------------------------------------------------------------------
!  Round-trip test of the Fortran binding (port of the reference's
!  graph_tests f_binding_test: build graphs, take derivatives, register
!  workflow items incl. a Newton converge item, compile, run, copy back).
!
!  Build + run (requires gfortran; see Makefile `ftest` target and the CI
!  fortran-binding job):
!      make -C capi ftest
!------------------------------------------------------------------------------
program f_binding_test
   use, intrinsic :: iso_c_binding
   use graph_fortran_binding
   implicit none

   call test_double()
   call test_newton_converge()
   call test_piecewise()
   print *, "All Fortran binding tests passed."

contains

   subroutine test_double()
      type(c_ptr) :: ctx, x, three, one, y, dy, x_next
      type(c_ptr), dimension(1) :: inputs, map_in, map_out
      type(c_ptr), dimension(2) :: outputs
      real(c_double), dimension(4), target :: xv, out
      integer :: i

      ctx = graph_construct_context(GRAPH_DOUBLE, logical(.false., c_bool))

      ! y = x^2 + 3x; dy/dx = 2x + 3
      x = graph_variable(ctx, 4_c_size_t, "x" // c_null_char)
      xv = [1.0_c_double, 2.0_c_double, 3.0_c_double, 4.0_c_double]
      call graph_set_variable(ctx, x, c_loc(xv))

      three = graph_constant(ctx, 3.0_c_double)
      y = graph_add(ctx, graph_mul(ctx, x, x), graph_mul(ctx, three, x))
      dy = graph_df(ctx, y, x)

      one = graph_constant(ctx, 1.0_c_double)
      x_next = graph_add(ctx, x, one)
      inputs(1) = x
      outputs(1) = y
      outputs(2) = dy
      map_in(1) = x_next
      map_out(1) = x
      call graph_add_item(ctx, inputs, 1_c_size_t, outputs, 2_c_size_t,   &
                          map_in, map_out, 1_c_size_t, c_null_ptr,        &
                          "test_kernel" // c_null_char, 4_c_size_t)
      call graph_compile(ctx)
      call graph_run(ctx)

      call graph_copy_to_host(ctx, x, c_loc(out))
      do i = 1, 4
         if (abs(out(i) - (xv(i) + 1.0_c_double)) > 1.0e-12_c_double) then
            print *, "setter map failed at", i, out(i)
            error stop 1
         end if
      end do

      ! dy evaluated at the updated x: 2x + 3
      call graph_copy_to_host(ctx, dy, c_loc(out))
      do i = 1, 4
         if (abs(out(i) - (2.0_c_double * (xv(i) + 1.0_c_double)          &
                           + 3.0_c_double)) > 1.0e-12_c_double) then
            print *, "derivative failed at", i, out(i)
            error stop 1
         end if
      end do

      call graph_destroy_context(ctx)
      print *, "f_binding double: ok"
   end subroutine

   subroutine test_newton_converge()
      ! solve x^2 = 2 with a converge item (reference solver::newton)
      type(c_ptr) :: ctx, x, two, f, fp, x_next, f2
      type(c_ptr), dimension(1) :: inputs, outputs, map_in, map_out
      real(c_double), dimension(2), target :: xv, out
      integer :: i

      ctx = graph_construct_context(GRAPH_DOUBLE, logical(.false., c_bool))
      x = graph_variable(ctx, 2_c_size_t, "x" // c_null_char)
      xv = [3.0_c_double, 0.5_c_double]
      call graph_set_variable(ctx, x, c_loc(xv))

      two = graph_constant(ctx, 2.0_c_double)
      f = graph_sub(ctx, graph_mul(ctx, x, x), two)
      fp = graph_df(ctx, f, x)
      x_next = graph_sub(ctx, x, graph_div(ctx, f, fp))
      f2 = graph_mul(ctx, f, f)

      inputs(1) = x
      outputs(1) = f2
      map_in(1) = x_next
      map_out(1) = x
      call graph_add_converge_item(ctx, inputs, 1_c_size_t, outputs,      &
                                   1_c_size_t, map_in, map_out,           &
                                   1_c_size_t, c_null_ptr,                &
                                   "newton" // c_null_char, 2_c_size_t,   &
                                   1.0e-28_c_double, 100_c_size_t)
      call graph_compile(ctx)
      call graph_run(ctx)

      call graph_copy_to_host(ctx, x, c_loc(out))
      do i = 1, 2
         if (abs(out(i) - sqrt(2.0_c_double)) > 1.0e-10_c_double) then
            print *, "newton failed at", i, out(i)
            error stop 1
         end if
      end do
      call graph_destroy_context(ctx)
      print *, "f_binding newton: ok"
   end subroutine

   subroutine test_piecewise()
      ! table lookup: data[(x - offset)/scale] with clamped truncation
      type(c_ptr) :: ctx, x, tabnode
      type(c_ptr), dimension(1) :: inputs, outputs, map_in, map_out
      real(c_double), dimension(4), target :: table
      real(c_double), dimension(3), target :: xv, out
      integer :: i
      real(c_double), dimension(3) :: expect

      ctx = graph_construct_context(GRAPH_DOUBLE, logical(.false., c_bool))
      x = graph_variable(ctx, 3_c_size_t, "x" // c_null_char)
      xv = [0.1_c_double, 1.4_c_double, 3.9_c_double]
      call graph_set_variable(ctx, x, c_loc(xv))

      table = [10.0_c_double, 20.0_c_double, 30.0_c_double, 40.0_c_double]
      tabnode = graph_piecewise_1d(ctx, x, 1.0_c_double, 0.0_c_double,    &
                                   c_loc(table), 4_c_size_t)

      inputs(1) = x
      outputs(1) = tabnode
      map_in(1) = x        ! identity map
      map_out(1) = x
      call graph_add_item(ctx, inputs, 1_c_size_t, outputs, 1_c_size_t,   &
                          map_in, map_out, 1_c_size_t, c_null_ptr,        &
                          "table_kernel" // c_null_char, 3_c_size_t)
      call graph_compile(ctx)
      call graph_run(ctx)

      call graph_copy_to_host(ctx, tabnode, c_loc(out))
      expect = [10.0_c_double, 20.0_c_double, 40.0_c_double]
      do i = 1, 3
         if (abs(out(i) - expect(i)) > 1.0e-12_c_double) then
            print *, "piecewise failed at", i, out(i)
            error stop 1
         end if
      end do
      call graph_destroy_context(ctx)
      print *, "f_binding piecewise: ok"
   end subroutine

end program f_binding_test
