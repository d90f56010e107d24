// Native OS sandbox: seccomp-BPF network filter + Landlock filesystem
// confinement — the TPU-host analog of the reference's mistralrs-sandbox
// (mistralrs-sandbox/src/lib.rs:316: landlock rulesets + seccomp filters
// around tool/code execution). Rust isn't available in this image, so the
// same kernel facilities are driven from C++ behind a ctypes binding
// (mistralrs_tpu/sandbox_native.py); applied in the child between fork and
// exec (subprocess preexec), inherited by all descendants.
//
// Soft-degrading: each mechanism that the kernel refuses is skipped and the
// caller learns what actually engaged from the returned bitmask.

#include <cerrno>
#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <linux/audit.h>
#include <linux/filter.h>
#include <linux/seccomp.h>
#include <sys/prctl.h>
#include <sys/stat.h>
#include <sys/syscall.h>
#include <unistd.h>

#ifndef SYS_landlock_create_ruleset
#define SYS_landlock_create_ruleset 444
#define SYS_landlock_add_rule 445
#define SYS_landlock_restrict_self 446
#endif

// Local definitions (linux/landlock.h may be absent from old sysroots).
struct ll_ruleset_attr {
    uint64_t handled_access_fs;
};
struct ll_path_beneath_attr {
    uint64_t allowed_access;
    int32_t parent_fd;
} __attribute__((packed));

#define LL_RULE_PATH_BENEATH 1
#define LL_CREATE_RULESET_VERSION (1U << 0)

// ABI v1 filesystem access rights (v2 adds REFER, v3 TRUNCATE).
#define LL_FS_EXECUTE (1ULL << 0)
#define LL_FS_WRITE_FILE (1ULL << 1)
#define LL_FS_READ_FILE (1ULL << 2)
#define LL_FS_READ_DIR (1ULL << 3)
#define LL_FS_REMOVE_DIR (1ULL << 4)
#define LL_FS_REMOVE_FILE (1ULL << 5)
#define LL_FS_MAKE_CHAR (1ULL << 6)
#define LL_FS_MAKE_DIR (1ULL << 7)
#define LL_FS_MAKE_REG (1ULL << 8)
#define LL_FS_MAKE_SOCK (1ULL << 9)
#define LL_FS_MAKE_FIFO (1ULL << 10)
#define LL_FS_MAKE_BLOCK (1ULL << 11)
#define LL_FS_MAKE_SYM (1ULL << 12)
#define LL_FS_REFER (1ULL << 13)
#define LL_FS_TRUNCATE (1ULL << 14)

#define MRS_APPLIED_NNP 1
#define MRS_APPLIED_LANDLOCK 2
#define MRS_APPLIED_SECCOMP_NET 4

namespace {

int landlock_abi() {
    long v = syscall(SYS_landlock_create_ruleset, nullptr, 0,
                     LL_CREATE_RULESET_VERSION);
    return v < 0 ? -1 : (int)v;
}

uint64_t fs_ro_bits() { return LL_FS_EXECUTE | LL_FS_READ_FILE | LL_FS_READ_DIR; }

uint64_t fs_all_bits(int abi) {
    uint64_t bits = (1ULL << 13) - 1;  // v1 set
    if (abi >= 2) bits |= LL_FS_REFER;
    if (abi >= 3) bits |= LL_FS_TRUNCATE;
    return bits;
}

// Bits the kernel accepts on a rule whose parent_fd is a regular file (or any
// non-directory): directory-only bits (READ_DIR, MAKE_*, REMOVE_*, REFER)
// make landlock_add_rule fail with EINVAL.
uint64_t file_compatible_bits(int abi) {
    uint64_t bits = LL_FS_EXECUTE | LL_FS_READ_FILE | LL_FS_WRITE_FILE;
    if (abi >= 3) bits |= LL_FS_TRUNCATE;
    return bits;
}

// Grant `access` beneath each path; unopenable paths are skipped (a policy
// listing /lib64 on a distro without it must not fail the whole sandbox).
// Non-directory paths (e.g. /dev/null in an rw list) get `access` masked to
// the file-compatible subset — the kernel rejects directory bits on files.
int add_rules(int ruleset_fd, const char** paths, int n, uint64_t access,
              int abi) {
    for (int i = 0; i < n; i++) {
        int fd = open(paths[i], O_PATH | O_CLOEXEC);
        if (fd < 0) continue;
        struct stat st;
        uint64_t granted = access;
        if (fstat(fd, &st) == 0 && !S_ISDIR(st.st_mode))
            granted &= file_compatible_bits(abi);
        if (granted == 0) {
            close(fd);
            continue;
        }
        ll_path_beneath_attr attr{granted, fd};
        long rc = syscall(SYS_landlock_add_rule, ruleset_fd,
                          LL_RULE_PATH_BENEATH, &attr, 0);
        close(fd);
        if (rc < 0) return -errno;
    }
    return 0;
}

int apply_landlock(const char** ro, int n_ro, const char** rw, int n_rw) {
    int abi = landlock_abi();
    if (abi < 1) return 0;  // kernel without Landlock: skip
    uint64_t handled = fs_all_bits(abi);
    ll_ruleset_attr rattr{handled};
    int fd = (int)syscall(SYS_landlock_create_ruleset, &rattr, sizeof(rattr), 0);
    if (fd < 0) return 0;
    int rc = add_rules(fd, ro, n_ro, fs_ro_bits(), abi);
    if (rc == 0) rc = add_rules(fd, rw, n_rw, handled, abi);
    if (rc == 0 && syscall(SYS_landlock_restrict_self, fd, 0) < 0) rc = -errno;
    close(fd);
    return rc < 0 ? rc : MRS_APPLIED_LANDLOCK;
}

#if defined(__x86_64__)
#define MRS_AUDIT_ARCH AUDIT_ARCH_X86_64
#elif defined(__aarch64__)
#define MRS_AUDIT_ARCH AUDIT_ARCH_AARCH64
#else
#define MRS_AUDIT_ARCH 0
#endif

// Block internet-family socket creation (AF_INET/AF_INET6/AF_PACKET/
// AF_NETLINK return EPERM; AF_UNIX stays, pipes/stdio untouched) and ptrace.
// ERRNO, not KILL: tools see a normal "Operation not permitted".
int apply_seccomp_net() {
#if MRS_AUDIT_ARCH == 0
    return 0;
#else
#ifndef __NR_socket
    return 0;
#else
    const uint32_t domains[] = {2 /*INET*/, 10 /*INET6*/, 16 /*NETLINK*/,
                                17 /*PACKET*/};
    sock_filter prog[] = {
        // arch gate: allow foreign-arch calls rather than misdecode numbers
        BPF_STMT(BPF_LD | BPF_W | BPF_ABS, 4),
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, MRS_AUDIT_ARCH, 1, 0),
        BPF_STMT(BPF_RET | BPF_K, SECCOMP_RET_ALLOW),
        BPF_STMT(BPF_LD | BPF_W | BPF_ABS, 0),  // syscall nr
#ifdef __NR_ptrace
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, __NR_ptrace, 7, 0),
#else
        BPF_STMT(BPF_LD | BPF_W | BPF_ABS, 0),
#endif
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, __NR_socket, 1, 0),
        BPF_STMT(BPF_RET | BPF_K, SECCOMP_RET_ALLOW),
        BPF_STMT(BPF_LD | BPF_W | BPF_ABS, 16),  // args[0] low word = domain
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, domains[0], 3, 0),
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, domains[1], 2, 0),
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, domains[2], 1, 0),
        BPF_JUMP(BPF_JMP | BPF_JEQ | BPF_K, domains[3], 0, 1),
        BPF_STMT(BPF_RET | BPF_K, SECCOMP_RET_ERRNO | (EPERM & 0xFFFF)),
        BPF_STMT(BPF_RET | BPF_K, SECCOMP_RET_ALLOW),
    };
    sock_fprog fprog = {(unsigned short)(sizeof(prog) / sizeof(prog[0])), prog};
    if (prctl(PR_SET_SECCOMP, SECCOMP_MODE_FILTER, &fprog, 0, 0) < 0)
        return 0;  // seccomp disabled in this kernel/container: skip
    return MRS_APPLIED_SECCOMP_NET;
#endif
#endif
}

}  // namespace

extern "C" {

// Probe (parent-safe, applies nothing): which mechanisms this kernel offers.
int mrs_sandbox_supported(void) {
    int got = MRS_APPLIED_NNP;
    if (landlock_abi() >= 1) got |= MRS_APPLIED_LANDLOCK;
    // SECCOMP_GET_ACTION_AVAIL probes filter support without installing one
#ifdef SYS_seccomp
    uint32_t action = SECCOMP_RET_ERRNO;
    if (syscall(SYS_seccomp, 2 /*SECCOMP_GET_ACTION_AVAIL*/, 0, &action) == 0)
        got |= MRS_APPLIED_SECCOMP_NET;
#endif
    return got;
}

// Apply in the CHILD (between fork and exec). Returns the bitmask of
// mechanisms that engaged, or -errno on a hard failure of a supported one.
// The seccomp network filter installs FIRST so a Landlock failure can never
// leave the process with the network open.
int mrs_sandbox_apply(int block_network, const char** ro_paths, int n_ro,
                      const char** rw_paths, int n_rw) {
    int got = 0;
    if (prctl(PR_SET_NO_NEW_PRIVS, 1, 0, 0, 0) == 0) got |= MRS_APPLIED_NNP;
    if (block_network) got |= apply_seccomp_net();
    if (n_ro + n_rw > 0) {
        int rc = apply_landlock(ro_paths, n_ro, rw_paths, n_rw);
        if (rc < 0) return rc;
        got |= rc;
    }
    return got;
}

}  // extern "C"
