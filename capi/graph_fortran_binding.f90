!------------------------------------------------------------------------------
!  Fortran 2008 binding for graph_framework_tpu.
!
!  iso_c_binding wrappers over the C API (graph_c_binding.h), mirroring the
!  interface surface of the reference's graph_fortran_binding.f90 so legacy
!  Fortran embedders can link against libgraph_tpu.so unchanged.
!
!  Build (requires gfortran, not present in the CI image - see Makefile):
!      gfortran -c graph_fortran_binding.f90
!      gfortran my_prog.f90 graph_fortran_binding.o -L. -lgraph_tpu
!------------------------------------------------------------------------------
module graph_fortran_binding
   use, intrinsic :: iso_c_binding
   implicit none

   ! graph_type enumeration (graph_c_binding.h)
   integer(c_int), parameter :: GRAPH_FLOAT = 0
   integer(c_int), parameter :: GRAPH_DOUBLE = 1
   integer(c_int), parameter :: GRAPH_COMPLEX_FLOAT = 2
   integer(c_int), parameter :: GRAPH_COMPLEX_DOUBLE = 3

   interface
      function graph_construct_context(gtype, use_safe_math)              &
            bind(c, name="graph_construct_context")
         import :: c_ptr, c_int, c_bool
         type(c_ptr) :: graph_construct_context
         integer(c_int), value :: gtype
         logical(c_bool), value :: use_safe_math
      end function

      subroutine graph_destroy_context(ctx)                               &
            bind(c, name="graph_destroy_context")
         import :: c_ptr
         type(c_ptr), value :: ctx
      end subroutine

      function graph_variable(ctx, length, symbol)                        &
            bind(c, name="graph_variable")
         import :: c_ptr, c_size_t, c_char
         type(c_ptr) :: graph_variable
         type(c_ptr), value :: ctx
         integer(c_size_t), value :: length
         character(kind=c_char), dimension(*) :: symbol
      end function

      function graph_constant(ctx, value)                                 &
            bind(c, name="graph_constant")
         import :: c_ptr, c_double
         type(c_ptr) :: graph_constant
         type(c_ptr), value :: ctx
         real(c_double), value :: value
      end function

      function graph_constant_c(ctx, re, im)                              &
            bind(c, name="graph_constant_c")
         import :: c_ptr, c_double
         type(c_ptr) :: graph_constant_c
         type(c_ptr), value :: ctx
         real(c_double), value :: re, im
      end function

      subroutine graph_set_variable(ctx, var, source)                     &
            bind(c, name="graph_set_variable")
         import :: c_ptr
         type(c_ptr), value :: ctx, var, source
      end subroutine

      function graph_pseudo_variable(ctx, node)                           &
            bind(c, name="graph_pseudo_variable")
         import :: c_ptr
         type(c_ptr) :: graph_pseudo_variable
         type(c_ptr), value :: ctx, node
      end function

      function graph_remove_pseudo(ctx, node)                             &
            bind(c, name="graph_remove_pseudo")
         import :: c_ptr
         type(c_ptr) :: graph_remove_pseudo
         type(c_ptr), value :: ctx, node
      end function

      function graph_add(ctx, l, r) bind(c, name="graph_add")
         import :: c_ptr
         type(c_ptr) :: graph_add
         type(c_ptr), value :: ctx, l, r
      end function

      function graph_sub(ctx, l, r) bind(c, name="graph_sub")
         import :: c_ptr
         type(c_ptr) :: graph_sub
         type(c_ptr), value :: ctx, l, r
      end function

      function graph_mul(ctx, l, r) bind(c, name="graph_mul")
         import :: c_ptr
         type(c_ptr) :: graph_mul
         type(c_ptr), value :: ctx, l, r
      end function

      function graph_div(ctx, l, r) bind(c, name="graph_div")
         import :: c_ptr
         type(c_ptr) :: graph_div
         type(c_ptr), value :: ctx, l, r
      end function

      function graph_sqrt(ctx, a) bind(c, name="graph_sqrt")
         import :: c_ptr
         type(c_ptr) :: graph_sqrt
         type(c_ptr), value :: ctx, a
      end function

      function graph_exp(ctx, a) bind(c, name="graph_exp")
         import :: c_ptr
         type(c_ptr) :: graph_exp
         type(c_ptr), value :: ctx, a
      end function

      function graph_log(ctx, a) bind(c, name="graph_log")
         import :: c_ptr
         type(c_ptr) :: graph_log
         type(c_ptr), value :: ctx, a
      end function

      function graph_pow(ctx, l, r) bind(c, name="graph_pow")
         import :: c_ptr
         type(c_ptr) :: graph_pow
         type(c_ptr), value :: ctx, l, r
      end function

      function graph_erfi(ctx, a) bind(c, name="graph_erfi")
         import :: c_ptr
         type(c_ptr) :: graph_erfi
         type(c_ptr), value :: ctx, a
      end function

      function graph_sin(ctx, a) bind(c, name="graph_sin")
         import :: c_ptr
         type(c_ptr) :: graph_sin
         type(c_ptr), value :: ctx, a
      end function

      function graph_cos(ctx, a) bind(c, name="graph_cos")
         import :: c_ptr
         type(c_ptr) :: graph_cos
         type(c_ptr), value :: ctx, a
      end function

      function graph_atan(ctx, l, r) bind(c, name="graph_atan")
         import :: c_ptr
         type(c_ptr) :: graph_atan
         type(c_ptr), value :: ctx, l, r
      end function

      function graph_random_state(ctx, seed)                              &
            bind(c, name="graph_random_state")
         import :: c_ptr, c_int32_t
         type(c_ptr) :: graph_random_state
         type(c_ptr), value :: ctx
         integer(c_int32_t), value :: seed
      end function

      function graph_random(ctx, state) bind(c, name="graph_random")
         import :: c_ptr
         type(c_ptr) :: graph_random
         type(c_ptr), value :: ctx, state
      end function

      function graph_piecewise_1d(ctx, arg, scale, offset, source,        &
                                  source_size)                            &
            bind(c, name="graph_piecewise_1D")
         import :: c_ptr, c_double, c_size_t
         type(c_ptr) :: graph_piecewise_1d
         type(c_ptr), value :: ctx, arg, source
         real(c_double), value :: scale, offset
         integer(c_size_t), value :: source_size
      end function

      function graph_piecewise_2d(ctx, num_cols, x_arg, x_scale,          &
                                  x_offset, y_arg, y_scale, y_offset,     &
                                  source, source_size)                    &
            bind(c, name="graph_piecewise_2D")
         import :: c_ptr, c_double, c_size_t
         type(c_ptr) :: graph_piecewise_2d
         type(c_ptr), value :: ctx, x_arg, y_arg, source
         integer(c_size_t), value :: num_cols, source_size
         real(c_double), value :: x_scale, x_offset, y_scale, y_offset
      end function

      function graph_index_1d(ctx, variable, arg, scale, offset)          &
            bind(c, name="graph_index_1D")
         import :: c_ptr, c_double
         type(c_ptr) :: graph_index_1d
         type(c_ptr), value :: ctx, variable, arg
         real(c_double), value :: scale, offset
      end function

      function graph_index_2d(ctx, variable, num_cols, x_arg, x_scale,    &
                              x_offset, y_arg, y_scale, y_offset)         &
            bind(c, name="graph_index_2D")
         import :: c_ptr, c_double, c_size_t
         type(c_ptr) :: graph_index_2d
         type(c_ptr), value :: ctx, variable, x_arg, y_arg
         integer(c_size_t), value :: num_cols
         real(c_double), value :: x_scale, x_offset, y_scale, y_offset
      end function

      subroutine graph_print(ctx, index, nodes, num_nodes)                &
            bind(c, name="graph_print")
         import :: c_ptr, c_size_t
         type(c_ptr), value :: ctx
         integer(c_size_t), value :: index, num_nodes
         type(c_ptr), dimension(*) :: nodes
      end subroutine

      function graph_df(ctx, num, den) bind(c, name="graph_df")
         import :: c_ptr
         type(c_ptr) :: graph_df
         type(c_ptr), value :: ctx, num, den
      end function

      function graph_get_max_concurrency(ctx)                             &
            bind(c, name="graph_get_max_concurrency")
         import :: c_ptr, c_size_t
         integer(c_size_t) :: graph_get_max_concurrency
         type(c_ptr), value :: ctx
      end function

      subroutine graph_set_device_number(ctx, n)                          &
            bind(c, name="graph_set_device_number")
         import :: c_ptr, c_size_t
         type(c_ptr), value :: ctx
         integer(c_size_t), value :: n
      end subroutine

      subroutine graph_add_item(ctx, inputs, num_inputs, outputs,         &
                                num_outputs, map_inputs, map_outputs,     &
                                num_maps, random_state, name, length)     &
            bind(c, name="graph_add_item")
         import :: c_ptr, c_size_t, c_char
         type(c_ptr), value :: ctx
         type(c_ptr), dimension(*) :: inputs, outputs
         type(c_ptr), dimension(*) :: map_inputs, map_outputs
         integer(c_size_t), value :: num_inputs, num_outputs, num_maps
         type(c_ptr), value :: random_state
         character(kind=c_char), dimension(*) :: name
         integer(c_size_t), value :: length
      end subroutine

      subroutine graph_add_pre_item(ctx, inputs, num_inputs, outputs,     &
                                    num_outputs, map_inputs, map_outputs, &
                                    num_maps, random_state, name, length) &
            bind(c, name="graph_add_pre_item")
         import :: c_ptr, c_size_t, c_char
         type(c_ptr), value :: ctx
         type(c_ptr), dimension(*) :: inputs, outputs
         type(c_ptr), dimension(*) :: map_inputs, map_outputs
         integer(c_size_t), value :: num_inputs, num_outputs, num_maps
         type(c_ptr), value :: random_state
         character(kind=c_char), dimension(*) :: name
         integer(c_size_t), value :: length
      end subroutine

      subroutine graph_add_converge_item(ctx, inputs, num_inputs,         &
                                         outputs, num_outputs,            &
                                         map_inputs, map_outputs,         &
                                         num_maps, random_state, name,    &
                                         length, tol, max_iter)           &
            bind(c, name="graph_add_converge_item")
         import :: c_ptr, c_size_t, c_char, c_double
         type(c_ptr), value :: ctx
         type(c_ptr), dimension(*) :: inputs, outputs
         type(c_ptr), dimension(*) :: map_inputs, map_outputs
         integer(c_size_t), value :: num_inputs, num_outputs, num_maps
         type(c_ptr), value :: random_state
         character(kind=c_char), dimension(*) :: name
         integer(c_size_t), value :: length, max_iter
         real(c_double), value :: tol
      end subroutine

      subroutine graph_compile(ctx) bind(c, name="graph_compile")
         import :: c_ptr
         type(c_ptr), value :: ctx
      end subroutine

      subroutine graph_pre_run(ctx) bind(c, name="graph_pre_run")
         import :: c_ptr
         type(c_ptr), value :: ctx
      end subroutine

      subroutine graph_run(ctx) bind(c, name="graph_run")
         import :: c_ptr
         type(c_ptr), value :: ctx
      end subroutine

      subroutine graph_wait(ctx) bind(c, name="graph_wait")
         import :: c_ptr
         type(c_ptr), value :: ctx
      end subroutine

      subroutine graph_copy_to_device(ctx, node, source)                  &
            bind(c, name="graph_copy_to_device")
         import :: c_ptr
         type(c_ptr), value :: ctx, node, source
      end subroutine

      subroutine graph_copy_to_host(ctx, node, destination)               &
            bind(c, name="graph_copy_to_host")
         import :: c_ptr
         type(c_ptr), value :: ctx, node, destination
      end subroutine
   end interface
end module graph_fortran_binding
