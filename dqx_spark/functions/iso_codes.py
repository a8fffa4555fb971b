"""Bundled ISO code sets for validity checks.

The reference bundles ISO 3166-1 / 3166-2 / 4217 / 639 resource files
(check_funcs.py:1167-1321).  We embed the public code lists directly.
Subdivision (3166-2) is validated structurally (``CC-SSS`` with a valid
country prefix) rather than against the full ~5,000-entry table — documented
deviation.
"""

# ISO 3166-1 alpha-2 country codes (officially assigned)
COUNTRY_ALPHA2 = """
AD AE AF AG AI AL AM AO AQ AR AS AT AU AW AX AZ BA BB BD BE BF BG BH BI BJ BL
BM BN BO BQ BR BS BT BV BW BY BZ CA CC CD CF CG CH CI CK CL CM CN CO CR CU CV
CW CX CY CZ DE DJ DK DM DO DZ EC EE EG EH ER ES ET FI FJ FK FM FO FR GA GB GD
GE GF GG GH GI GL GM GN GP GQ GR GS GT GU GW GY HK HM HN HR HT HU ID IE IL IM
IN IO IQ IR IS IT JE JM JO JP KE KG KH KI KM KN KP KR KW KY KZ LA LB LC LI LK
LR LS LT LU LV LY MA MC MD ME MF MG MH MK ML MM MN MO MP MQ MR MS MT MU MV MW
MX MY MZ NA NC NE NF NG NI NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM PN PR
PS PT PW PY QA RE RO RS RU RW SA SB SC SD SE SG SH SI SJ SK SL SM SN SO SR SS
ST SV SX SY SZ TC TD TF TG TH TJ TK TL TM TN TO TR TT TV TW TZ UA UG UM US UY
UZ VA VC VE VG VI VN VU WF WS YE YT ZA ZM ZW
""".split()

# ISO 3166-1 alpha-3 country codes
COUNTRY_ALPHA3 = """
AND ARE AFG ATG AIA ALB ARM AGO ATA ARG ASM AUT AUS ABW ALA AZE BIH BRB BGD
BEL BFA BGR BHR BDI BEN BLM BMU BRN BOL BES BRA BHS BTN BVT BWA BLR BLZ CAN
CCK COD CAF COG CHE CIV COK CHL CMR CHN COL CRI CUB CPV CUW CXR CYP CZE DEU
DJI DNK DMA DOM DZA ECU EST EGY ESH ERI ESP ETH FIN FJI FLK FSM FRO FRA GAB
GBR GRD GEO GUF GGY GHA GIB GRL GMB GIN GLP GNQ GRC SGS GTM GUM GNB GUY HKG
HMD HND HRV HTI HUN IDN IRL ISR IMN IND IOT IRQ IRN ISL ITA JEY JAM JOR JPN
KEN KGZ KHM KIR COM KNA PRK KOR KWT CYM KAZ LAO LBN LCA LIE LKA LBR LSO LTU
LUX LVA LBY MAR MCO MDA MNE MAF MDG MHL MKD MLI MMR MNG MAC MNP MTQ MRT MSR
MLT MUS MDV MWI MEX MYS MOZ NAM NCL NER NFK NGA NIC NLD NOR NPL NRU NIU NZL
OMN PAN PER PYF PNG PHL PAK POL SPM PCN PRI PSE PRT PLW PRY QAT REU ROU SRB
RUS RWA SAU SLB SYC SDN SWE SGP SHN SVN SJM SVK SLE SMR SEN SOM SUR SSD STP
SLV SXM SYR SWZ TCA TCD ATF TGO THA TJK TKL TLS TKM TUN TON TUR TTO TUV TWN
TZA UKR UGA UMI USA URY UZB VAT VCT VEN VGB VIR VNM VUT WLF WSM YEM MYT ZAF
ZMB ZWE
""".split()

# ISO 4217 active currency codes
CURRENCY_CODES = """
AED AFN ALL AMD ANG AOA ARS AUD AWG AZN BAM BBD BDT BGN BHD BIF BMD BND BOB
BOV BRL BSD BTN BWP BYN BZD CAD CDF CHE CHF CHW CLF CLP CNY COP COU CRC CUC
CUP CVE CZK DJF DKK DOP DZD EGP ERN ETB EUR FJD FKP GBP GEL GHS GIP GMD GNF
GTQ GYD HKD HNL HRK HTG HUF IDR ILS INR IQD IRR ISK JMD JOD JPY KES KGS KHR
KMF KPW KRW KWD KYD KZT LAK LBP LKR LRD LSL LYD MAD MDL MGA MKD MMK MNT MOP
MRU MUR MVR MWK MXN MXV MYR MZN NAD NGN NIO NOK NPR NZD OMR PAB PEN PGK PHP
PKR PLN PYG QAR RON RSD RUB RWF SAR SBD SCR SDG SEK SGD SHP SLE SLL SOS SRD
SSP STN SVC SYP SZL THB TJS TMT TND TOP TRY TTD TWD TZS UAH UGX USD USN UYI
UYU UYW UZS VED VES VND VUV WST XAF XAG XAU XBA XBB XBC XBD XCD XDR XOF XPD
XPF XPT XSU XTS XUA XXX YER ZAR ZMW ZWL
""".split()

# ISO 639-1 two-letter language codes
LANGUAGE_CODES = """
aa ab ae af ak am an ar as av ay az ba be bg bh bi bm bn bo br bs ca ce ch co
cr cs cu cv cy da de dv dz ee el en eo es et eu fa ff fi fj fo fr fy ga gd gl
gn gu gv ha he hi ho hr ht hu hy hz ia id ie ig ii ik io is it iu ja jv ka kg
ki kj kk kl km kn ko kr ks ku kv kw ky la lb lg li ln lo lt lu lv mg mh mi mk
ml mn mr ms mt my na nb nd ne ng nl nn no nr nv ny oc oj om or os pa pi pl ps
pt qu rm rn ro ru rw sa sc sd se sg si sk sl sm sn so sq sr ss st su sv sw ta
te tg th ti tk tl tn to tr ts tt tw ty ug uk ur uz ve vi vo wa wo xh yi yo za
zh zu
""".split()

COUNTRY_CODES = COUNTRY_ALPHA2 + COUNTRY_ALPHA3


# ISO 3166-1 numeric country codes (public standard data; three-digit
# strings, e.g. "840" = US)
COUNTRY_NUMERIC = """
004 008 010 012 016 020 024 028 031 032 036 040 044 048 050 051 052 056
060 064 068 070 072 074 076 084 086 090 092 096 100 104 108 112 116 120
124 132 136 140 144 148 152 156 158 162 166 170 174 175 178 180 184 188
191 192 196 203 204 208 212 214 218 222 226 231 232 233 234 238 239 242
246 248 250 254 258 260 262 266 268 270 275 276 288 292 296 300 304 308
312 316 320 324 328 332 334 336 340 344 348 352 356 360 364 368 372 376
380 384 388 392 398 400 404 408 410 414 417 418 422 426 428 430 434 438
440 442 446 450 454 458 462 466 470 474 478 480 484 492 496 498 499 500
504 508 512 516 520 524 528 531 533 534 535 540 548 554 558 562 566 570
574 578 580 581 583 584 585 586 591 598 600 604 608 612 616 620 624 626
630 634 638 642 643 646 652 654 659 660 662 663 666 670 674 678 682 686
688 690 694 702 703 704 705 706 710 716 724 728 729 732 740 744 748 752
756 760 762 764 768 772 776 780 784 788 792 795 796 798 800 804 807 818
826 831 832 833 834 840 850 854 858 860 862 876 882 887 894
""".split()

# ISO 4217 numeric currency codes (public standard data, e.g. "840" = USD)
CURRENCY_NUMERIC = """
008 012 032 036 044 048 050 051 052 060 064 068 072 084 090 096 104 108
116 124 132 136 144 152 156 170 174 188 192 203 208 214 222 230 232 238
242 262 270 292 320 324 328 332 340 344 348 352 356 360 364 368 376 388
392 396 398 400 404 408 410 414 417 418 422 426 430 434 446 454 458 462
480 484 496 498 504 512 516 524 532 533 548 554 558 566 578 586 590 598
600 604 608 634 643 646 654 682 690 702 704 706 710 728 748 752 756 760
764 776 780 784 788 800 807 818 826 834 840 858 860 882 886 901 924 925
926 927 928 929 930 933 934 936 938 940 941 943 944 946 947 948 949 950
951 952 953 955 956 957 958 959 960 961 962 963 964 965 967 968 969 970
971 972 973 976 977 978 979 980 981 984 985 986 990 994 997 999
""".split()

# ISO 639-2/T terminology three-letter codes for the ISO 639-1 languages
# above (public standard data).  Documented deviation from the reference,
# which validates alpha-3 against the FULL ISO 639-3 registry (~7,900
# codes) from a bundled resource file; this set covers the 639-1-aligned
# subset, each member verified to also be a valid 639-3 code.
LANGUAGE_ALPHA3 = """
aar abk afr aka amh ara arg asm ava ave aym aze bak bam bel ben bis bod
bos bre bul cat ces cha che chu chv cor cos cre cym dan deu div dzo ell
eng epo est eus ewe fao fas fij fin fra fry ful gla gle glg glv grn guj
hat hau heb her hin hmo hrv hun hye ibo ido iii iku ile ina ind ipk isl
ita jav jpn kal kan kas kat kau kaz khm kik kin kir kom kon kor kua kur
lao lat lav lim lin lit ltz lub lug mah mal mar mkd mlg mlt mon mri msa
mya nau nav nbl nde ndo nep nld nno nob nor nya oci oji ori orm oss pan
pli pol por pus que roh ron run rus sag san sin slk slv sme smo sna snd
som sot spa sqi srd srp ssw sun swa swe tah tam tat tel tgk tgl tha tir
ton tsn tso tuk tur twi uig ukr urd uzb ven vie vol wln wol xho yid yor
zha zho zul
""".split()
