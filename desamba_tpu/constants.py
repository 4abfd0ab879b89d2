"""Compile-time constants of the reference engine, collected in one place.

Every value cites its origin in /root/reference (file:line) so parity can be
audited. These are the contract the TPU engine reproduces.
"""

# ---- index geometry ----------------------------------------------------
B_KMER = 31                  # index k-mer length             (idx.c:8)
L_PRE_IDX = 13               # 13-base prefix hash            (idx.h:58)
PRE_IDX_MASK = 0x3FFFFFF     # 26-bit mask                    (idx.h:59)
MIN_UNI_L = 35               # min unitig length kept         (idx.h:40)
BP_PER_BLOCK = 256           # FM occ block size in bp        (bwt.c:108)
BLOCK_BYTES = 168            # 40 B base + 128 B codes        (bwt.c:33-41)
NUM_BP_OCCUPY_ONE_SA = 8     # SA sampling stride             (bwt.h:6)
SA_MASK = 0x7                # (bwt.h:7)
SA_OFF = 3                   # (bwt.h:8)

# char codes: A=0 C=1 G=2 T=3 '#'=4 '$'=5                     (bwt.c:11-29)
CODE_HASH = 4
CODE_DOLLAR = 5

# ---- exist-filter ------------------------------------------------------
SINGLE_BASE_MAX_RATIO = 0.8  # low-complexity filter          (idx.c:965)
# e_kmer size ladder: (max n_kmer threshold exclusive, table bytes,
#                      hash mask bits, e-kmer length)          (idx.c:966-998)
EK_SIZE_LADDER = [
    ((1 << 31) // 9, 0x8000000, 30, 16),
    ((1 << 32) // 9, 0x10000000, 31, 17),
    ((1 << 33) // 9, 0x20000000, 32, 17),
    ((1 << 34) // 9, 0x40000000, 33, 18),
    ((1 << 35) // 9, 0x80000000, 34, 18),
    ((1 << 36) // 9, 0x100000000, 35, 19),
    ((1 << 37) // 9, 0x200000000, 36, 19),
    ((1 << 38) // 9, 0x400000000, 37, 20),
]

# ---- classify ----------------------------------------------------------
MIN_READ_LEN = 40            # (cly.c:3058)
STEP_EK = 3                  # island probe stride            (cly.c:969)
SEED_RANGE = 100             # top-seed window                (cly.c:1019)
ISLAND_MAX_LEN = 60          # island growth cap              (cly.c:1000)
MEM_SEARCH_FAST = 2          # (cly.c:1471)
MIN_MEM_LEN_FAST = 21        # (cly.c:1472)
MEM_SEARCH_SLOW = 8          # (cly.c:1543)
MIN_MEM_LEN_SLOW = 20        # (cly.c:1544)
LV_ERROR = 4                 # max LV edit distance           (cly.c:493)
LV_L = 12                    # max LV query length            (cly.c:699)
MIN_S_1 = 12                 # (cly.c:691)
MIN_S_2 = 20                 # (cly.c:692)
SP_SET_CAP = 500             # dedup ring capacity            (cly.c:1482)
SUPER_REPEAT_LIMIT = 50      # REF_POS fan-out cap            (cly.c:842)
SUPER_REPEAT_MAX = 1000      # bail-out threshold             (cly.c:878)

# chaining
MAX_DIS_MINUS = 30           # diagonal tolerance             (cly.c:113)
MAX_WAITING_LEN = 400        # gap cap M2                     (cly.c:114)
MAX_ANCHOR_OVERLAP = 3       # (cly.c:236)
CHAIN_M3_THRESHOLD = 50      # anchors >= 50 -> SDP chaining  (cly.c:330)

# rescoring (M2)
S_A_KMER_L = 9               # sparse-align k-mer length      (cly.c:1707)
MIN_SCORE_MEM = 12           # (cly.c:1708)
OVER_SEARCH_M2 = 50          # (cly.c:2221)
MAX_SMS_OVERLAP = 6          # (cly.c:2437-2438)

# filtering
FILTER_MIN_SCORE_2G = 26     # NGS reads                      (cly.c:2870)
FILTER_MIN_SCORE_SHORT_3G = 30  # short 3G reads              (cly.c:2869)
NGS_MAX_READ_L = 510         # (cly.c:2955)
SHORT_3G_READ_L = 310        # (cly.c:2964)
DEFAULT_FILTER_MIN_LENGTH = 170  # -l default                 (cly_mt.c:469)
DEFAULT_MIN_SCORE = 64       # -s default                     (cly_mt.c:469)
DEFAULT_MAX_SEC_N = 5        # -r default                     (cly_mt.c:469)
DEFAULT_THREADS = 4          # -t default                     (cly_mt.c:469)

# MAPQ model                                                  (cly_mt.c:396-420)
P_E = 0.15
Q_MEM_MAX = 2000             # (idx.h:61)
MAX_LV_WRONG = 20            # (idx.h:62)
MAX_LV_R_LEN = 20            # (idx.h:63)

# batch driver
N_NEEDED = 5000              # reads per batch                (cly_mt.c:22)
MAX_READ_SIZE = 10_000_000   # bytes per batch                (cly_mt.c:23)
MAX_HUMAN_SNAPSHOT_LEN = 64 * 1024  # (cly_mt.c:24)

# primary detection
PRIMARY, SECONDARY, SUPPLEMENTARY = 1, 2, 3  # (cly.h:65-67)

# analysis
HUMAN_TIDS = (9606, 63221, 741158)  # (cly_mt.c:1121)
ANIMAL_PLANT_TIDS = (33208, 33090)  # (cly_mt.c:880)
META_USE_READ_NUM = 0        # (desamba.h:43)
META_USE_BASE_NUM = 1        # (desamba.h:44)
