#!/bin/sh
# Build the reference ffmpeg oracle into /root/repo/.refbuild (out of tree).
# Trimmed component set: everything the test suite cross-validates against.
# Reruns configure only when ffmpeg binary is absent.
set -e
mkdir -p /root/repo/.refbuild
cd /root/repo/.refbuild
if [ ! -f config.h ]; then
nice -n 19 /root/reference/configure \
  --disable-doc --disable-ffplay --disable-network --disable-autodetect --enable-zlib \
  --disable-asm --enable-gpl --enable-agpl --enable-version3 \
  --disable-everything \
  --enable-protocol='file,pipe,concat,data' --enable-indev=lavfi --enable-avdevice \
  --enable-decoder='h264,hevc,vp8,vp9,mpeg4,mjpeg,png,gif,rawvideo,flac,aac,ac3,eac3,vorbis,opus,mp1,mp2,mp3,mp1float,mp2float,mp3float,pcm*,adpcm_ima_wav,adpcm_ms,adpcm_yamaha,msmpeg4v3,mpeg1video,mpeg2video,h263,dca,alac,wmav2,tta,wavpack' \
  --enable-encoder='mpeg4,mjpeg,png,gif,rawvideo,flac,aac,ac3,eac3,vorbis,opus,mp2,pcm*,adpcm_ima_wav,adpcm_ms,adpcm_yamaha,mpeg1video,mpeg2video,h263,alac,wrapped_avframe' \
  --enable-demuxer='mov,matroska,avi,mpegts,wav,ogg,flac,aac,ac3,eac3,mp3,flv,gif,image2,image2pipe,rawvideo,h264,hevc,ivf,m4v,mjpeg,pcm*,srt,concat,hls,dash,mpegvideo,yuv4mpegpipe,data,au,aiff,caf,dts,tta,wv,h263' \
  --enable-muxer='mp4,mov,matroska,avi,mpegts,wav,ogg,flac,adts,ac3,mp3,flv,gif,image2,image2pipe,rawvideo,h264,hevc,ivf,m4v,mjpeg,null,md5,framecrc,framemd5,crc,hash,framehash,segment,hls,dash,yuv4mpegpipe,pcm*,srt,opus,oga,data,au,aiff,caf,h263,mpeg1video,mpeg2video' \
  --enable-parser='h264,hevc,vp8,vp9,mpeg4video,mjpeg,flac,aac,ac3,vorbis,opus,mpegaudio,png,mpegvideo,gif,h263' \
  --enable-bsf='h264_mp4toannexb,hevc_mp4toannexb,extract_extradata,aac_adtstoasc,null,chomp,noise,setts,dump_extradata,h264_metadata,mp3_header_decompress' \
  --enable-filter='scale,asf2sf,apad,aresample,aformat,format,null,anull,nullsink,anullsink,nullsrc,testsrc,testsrc2,rgbtestsrc,smptebars,color,sine,anoisesrc,aevalsrc,buffer,abuffer,buffersink,abuffersink,overlay,psnr,ssim,crop,pad,fps,setpts,asetpts,atrim,trim,concat,amix,amerge,join,volume,volumedetect,astats,showinfo,ashowinfo,xfade,minterpolate,yadif,transpose,hflip,vflip,eq,hue,lut,lutyuv,lutrgb,drawbox,afir,silencedetect,ebur128,loudnorm,channelsplit,channelmap,pan,asetrate,atempo,adelay,aecho,afade,fade,reverse,areverse,hstack,vstack,select,aselect,setsar,settb,asettb,split,asplit,tile,thumbnail,showwaves,showspectrum,loop,aloop,tpad,extractplanes,shuffleplanes,blend,deflicker,framerate,mpdecimate,setdar,zoompan,rotate,unsharp,boxblur,gblur,edgedetect,sobel,negate,alphaextract,alphamerge,premultiply,histogram,waveform,vectorscope,signalstats,idet,bwdif,w3fdif,interlace,telecine,detelecine,mergeplanes,setfield,separatefields,weave,shuffleframes,realtime,metadata,amultiply'
fi
nice -n 19 make -j2 >/root/repo/.refbuild/build.log 2>&1
echo REFBUILD_DONE
