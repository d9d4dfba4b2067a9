/* ABI driver test: exercises the extern "C" pam_interface surface exactly
 * as the generated Fortran bindings (pam_fortran_interface.F90) do via
 * ISO_C_BINDING — same entry points, same argument passing. This is the
 * analog of the reference's standalone/mmf_simplified/fortran_test.F90:1-51
 * (this build image has no Fortran compiler, so the driver is C; the
 * Fortran module itself is generated for GCM-side builds that have one).
 *
 * Compiled + run by tests/test_native_interface.py.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* the C ABI (mirrors pam_interface_extern_c.cpp entry names) */
#ifdef __cplusplus
extern "C" {
#endif
extern void pam_interface_finalize(void);
extern void pam_interface_register_dimension(const char *, int);
extern int pam_interface_get_dimension_size(const char *);
extern void pam_interface_mirror_array_readonly_double(
    const char *, const char *, int *, int, double *);
extern void pam_interface_mirror_array_readwrite_double(
    const char *, const char *, int *, int, double *);
extern void pam_interface_register_and_allocate_float(
    const char *, const char *, int *, int);
extern void pam_interface_unregister_and_deallocate(const char *);
extern int pam_interface_array_exists(const char *);
extern void *pam_interface_get_array_ptr(const char *);
extern int pam_interface_get_array_rank(const char *);
extern void pam_interface_get_array_dims(const char *, int *);
extern int pam_interface_array_readonly(const char *);
extern void pam_interface_make_readonly(const char *);
extern void pam_interface_set_option_double(const char *, double);
extern double pam_interface_get_option_double(const char *);
extern void pam_interface_set_option_int(const char *, int);
extern int pam_interface_get_option_int(const char *);
extern void pam_interface_set_option_string(const char *, const char *);
extern void pam_interface_get_option_string(const char *, char *, int);
extern int pam_interface_option_is_set(const char *);
extern long long pam_interface_validate_array(const char *, int, int, int);
#ifdef __cplusplus
}
#endif

#define CHECK(cond, msg)                                                     \
  do {                                                                       \
    if (!(cond)) {                                                           \
      fprintf(stderr, "FAIL: %s\n", msg);                                    \
      return 1;                                                              \
    }                                                                        \
  } while (0)

int main(void) {
  /* options round trip (fortran_test.F90: set/get option) */
  pam_interface_set_option_double("crm_dt", 20.0);
  CHECK(pam_interface_get_option_double("crm_dt") == 20.0, "double option");
  pam_interface_set_option_int("nens", 128);
  CHECK(pam_interface_get_option_int("nens") == 128, "int option");
  pam_interface_set_option_string("dycore", "spam");
  char buf[64];
  pam_interface_get_option_string("dycore", buf, 64);
  CHECK(strcmp(buf, "spam") == 0, "string option");
  CHECK(pam_interface_option_is_set("crm_dt") == 1, "option_is_set");
  CHECK(pam_interface_option_is_set("missing") == 0, "option_is_set neg");

  /* dimensions */
  pam_interface_register_dimension("nz", 50);
  CHECK(pam_interface_get_dimension_size("nz") == 50, "dimension");

  /* zero-copy mirror of caller-owned memory (row-major dims like the
   * generated Fortran bindings pass: reversed Fortran shape) */
  double gcm[2 * 3 * 4];
  for (int i = 0; i < 24; ++i) gcm[i] = (double)i;
  int dims[3] = {2, 3, 4};
  pam_interface_mirror_array_readwrite_double("state", "gcm state", dims, 3,
                                              gcm);
  CHECK(pam_interface_array_exists("state") == 1, "exists");
  CHECK(pam_interface_get_array_rank("state") == 3, "rank");
  int d2[3];
  pam_interface_get_array_dims("state", d2);
  CHECK(d2[0] == 2 && d2[1] == 3 && d2[2] == 4, "dims");
  double *view = (double *)pam_interface_get_array_ptr("state");
  CHECK(view == gcm, "zero copy (pointer identity)");
  view[5] = -7.0;
  CHECK(gcm[5] == -7.0, "mutation visible to owner");

  /* validators (PAM_DEBUG analog): no NaN/inf, positivity violated */
  gcm[3] = -1.0;
  CHECK(pam_interface_validate_array("state", 1, 1, 0) == 0, "nan/inf ok");
  CHECK(pam_interface_validate_array("state", 0, 0, 1) > 0, "positivity");

  /* readonly flagging */
  pam_interface_make_readonly("state");
  CHECK(pam_interface_array_readonly("state") == 1, "readonly");

  /* allocate-owned array */
  int fd[2] = {4, 5};
  pam_interface_register_and_allocate_float("work", "", fd, 2);
  CHECK(pam_interface_array_exists("work") == 1, "allocate");
  float *wp = (float *)pam_interface_get_array_ptr("work");
  for (int i = 0; i < 20; ++i) CHECK(wp[i] == 0.0f, "zero init");
  pam_interface_unregister_and_deallocate("work");
  CHECK(pam_interface_array_exists("work") == 0, "deallocate");

  pam_interface_finalize();
  CHECK(pam_interface_array_exists("state") == 0, "finalize clears");
  printf("abi_test: ALL OK\n");
  return 0;
}
