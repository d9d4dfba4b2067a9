!! Standalone exercise of the GCM-facing Fortran binding surface — the
!! analog of the reference's standalone/mmf_simplified/fortran_test.F90
!! (same call forms, so reference-era GCM glue compiles unchanged).
!! Compiled + run by tests/test_fortran_surface.py when a Fortran
!! compiler is present; prints CHECK lines the test asserts on.
program fortran_test
  use iso_c_binding
  use pam_fortran_interface
  implicit none
  character(len=pam_maxlen) :: str
  logical(c_bool), pointer, contiguous :: flags(:)
  real(c_double), pointer, contiguous :: grid(:,:)
  real(8) :: host(5,7,4)
  real(8) :: num
  logical :: exists
  integer :: i, j, k

  call pam_register_dimension('ncol', 100)
  call pam_set_option('scheme', 'p3')
  call pam_get_option('scheme', str)
  write(*,*) 'CHECK option-string ', trim(str)
  call pam_set_option('dt', 0.25D0)
  call pam_get_option('dt', num)
  write(*,*) 'CHECK option-double ', num
  call pam_option_exists('scheme', exists)
  write(*,*) 'CHECK exists-before ', exists
  call pam_remove_option('scheme')
  call pam_option_exists('scheme', exists)
  write(*,*) 'CHECK exists-after ', exists

  call pam_create_array_logical('flags', [10], 'flag array')
  call pam_get_array('flags', flags)
  call pam_create_array_double('grid', [10, 12])
  call pam_get_array('grid', grid)
  grid = 2.0D0
  write(*,*) 'CHECK grid-sum ', sum(grid)

  do k = 1, 4
    do j = 1, 7
      do i = 1, 5
        host(i,j,k) = i + 10*j + 100*k
      end do
    end do
  end do
  call pam_mirror_array_readonly('host_ro', host)
  call pam_mirror_array_readwrite('host_rw', host)
  call pam_array_exists('host_rw', exists)
  write(*,*) 'CHECK mirror-exists ', exists
  call pam_make_readonly('grid')

  call pam_finalize()
  write(*,*) 'CHECK done'
end program
